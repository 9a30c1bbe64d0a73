"""PDF → text extraction — the second crawl-container front stage
(verdict r10 item 4 of "what's missing"): real crawl corpora carry PDF
at minimum, and the HTML front door (``html_extract``) covered only
one container. The extraction recipe is the naive-pdftotext standard:
pull every content STREAM, keep the text blocks (``BT`` … ``ET``),
read the string operands of ``Tj`` show operators in stream order
(reading order for linearly-written documents), unescape the PDF
string escapes — one ``Tj`` per line. Everything downstream (line
split, portable line hash, line-frequency boilerplate removal, the
per-source rollup, the materializing rebuild) is SHARED with the HTML
stage (``html_extract.flagged_extracted_lines`` /
``extract_stats_rollup`` / ``rebuild_extracted_documents``): the
container changes only the text-extraction expression.

Because the fixtures carry plain text, the operator follows the
``multimodal/binary.py`` convention: SYNTHESIZE a structurally real
minimal PDF per document — header, catalog/pages/page objects, a
content stream with a correct ``/Length``, a font object, a real XREF
table with byte-exact lpad-ed offsets, trailer and ``startxref`` —
deterministically from the row, then run the real extraction against
it, so the DuckDB twin replays synthesis AND extraction exactly
(offsets included: objects 1–3 are constant, so only the stream-
length-dependent tail is computed per row, in both engines).

The synthesized page carries the same boilerplate structure as the
HTML fixture: a letterhead line shared by EVERY document (global
boilerplate), a per-source footer (grouped boilerplate, with escaped
parens so unescaping is exercised on boilerplate too), a title line
and the body (unique — must survive). PDF string escaping (``\\``,
``\\(``, ``\\)``) round-trips through the body text.

100 TB shape: identical to the HTML stage — synthesis + extraction is
one scan-side regexp/array expression chain in whole-stage codegen
(zero Python), the boilerplate pass is ONE count-distinct groupBy on
the portable line hash with the metadata-sized boilerplate set
broadcast back; the corpus is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .html_extract import (HTML_BOILER_MILLI, extract_stats_rollup,
                           flagged_extracted_lines,
                           rebuild_extracted_documents)

# the global-boilerplate letterhead every synthesized page carries
PDF_LETTERHEAD = "ACME Web Archive - Crawl Snapshot"

# constant PDF objects (shared with the DuckDB twin through these
# module literals — one definition, two engines)
PDF_HEADER = "%PDF-1.4\n"
PDF_OBJ1 = "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
PDF_OBJ2 = "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
PDF_OBJ3 = ("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox "
            "[0 0 612 792] /Contents 4 0 R /Resources "
            "<< /Font << /F1 5 0 R >> >> >>\nendobj\n")
PDF_OBJ5 = ("5 0 obj\n<< /Type /Font /Subtype /Type1 "
            "/BaseFont /Helvetica >>\nendobj\n")

# object byte offsets: 1-3 are constants; obj4 embeds the variable
# stream, so offset(5) and the xref position are runtime expressions
PDF_OFF1 = len(PDF_HEADER)
PDF_OFF2 = PDF_OFF1 + len(PDF_OBJ1)
PDF_OFF3 = PDF_OFF2 + len(PDF_OBJ2)
PDF_OFF4 = PDF_OFF3 + len(PDF_OBJ3)


def _esc_pdf(col) -> "F.Column":
    """PDF string-literal escaping for synthesis: backslash FIRST,
    then both parens (the inverse order of ``_unesc_pdf``)."""
    x = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    x = F.replace(x, F.lit("("), F.lit("\\("))
    return F.replace(x, F.lit(")"), F.lit("\\)"))


def synthesize_pdf(documents: DataFrame) -> DataFrame:
    """(doc_id, source[, lang], pdf): one structurally real minimal
    PDF per document, byte-deterministic scan-side concat (the DuckDB
    twin builds identical bytes, xref offsets included)."""
    did = F.col("doc_id").cast("string")
    src = F.col("source")
    # the body is written ONE Tj PER TEXT LINE (real PDF writers emit
    # a text-positioning op per line) — operands therefore never
    # contain a raw newline, so multi-line text can never embed a
    # '\\nendstream' / '\\nET' sequence that would truncate the naive
    # textual framing regexes (review r11: the writer's correct
    # /Length couldn't save a lazy regex from an embedded marker, and
    # both engines truncated identically so the oracle was blind);
    # extraction rebuilds the original line structure exactly
    body = F.array_join(
        F.transform(F.split(F.col("text"), "\n"),
                    lambda ln: F.concat(F.lit("("), _esc_pdf(ln),
                                        F.lit(") Tj"))),
        "\n0 -14 Td\n")
    stream = F.concat(
        F.lit("BT\n/F1 12 Tf\n72 720 Td\n("),
        F.lit(PDF_LETTERHEAD),
        F.lit(") Tj\n0 -14 Td\n("),
        src, F.lit(" document "), did,
        F.lit(") Tj\n0 -14 Td\n"),
        body,
        F.lit("\n0 -14 Td\n(Page 1 of 1 - \\(c\\) 2026 "),
        src, F.lit(") Tj\nET"))
    obj4 = F.concat(
        F.lit("4 0 obj\n<< /Length "),
        F.octet_length(stream).cast("string"),
        F.lit(" >>\nstream\n"), stream,
        F.lit("\nendstream\nendobj\n"))
    off5 = F.lit(PDF_OFF4) + F.octet_length(obj4)
    offx = off5 + F.lit(len(PDF_OBJ5))
    xref = F.concat(
        F.lit("xref\n0 6\n0000000000 65535 f \n"
              + "".join(f"{o:010d} 00000 n \n"
                        for o in (PDF_OFF1, PDF_OFF2, PDF_OFF3,
                                  PDF_OFF4))),
        F.lpad(off5.cast("string"), 10, "0"), F.lit(" 00000 n \n"),
        F.lit("trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"),
        offx.cast("string"), F.lit("\n%%EOF"))
    pdf = F.concat(F.lit(PDF_HEADER + PDF_OBJ1 + PDF_OBJ2 + PDF_OBJ3),
                   obj4, F.lit(PDF_OBJ5), xref)
    cols = [c for c in ("doc_id", "source", "lang") if c
            in documents.columns]
    return documents.select(*cols, pdf.alias("pdf"))


def pdf_to_text(col) -> "F.Column":
    """Text extraction expression over a pdf column: content streams →
    BT/ET text blocks → ``Tj`` string operands (escape-aware capture)
    → unescape (parens first, backslash LAST — the exact inverse of
    the writer's backslash-first escaping; replaces scan left-to-right
    and every literal paren inside an operand is escaped, so the
    paren pass can never split an escaped backslash pair) → one line
    per Tj. NULL pdf → NULL text (the shared line pass keeps the doc
    visible via posexplode_outer)."""
    streams = F.regexp_extract_all(
        col, F.lit(r"(?s)stream\n(.*?)\nendstream"), 1)
    blocks = F.flatten(F.transform(
        streams, lambda s: F.regexp_extract_all(
            s, F.lit(r"(?s)BT\n(.*?)\nET"), 1)))
    tjs = F.flatten(F.transform(
        blocks, lambda b: F.regexp_extract_all(
            b, F.lit(r"\(((?:[^()\\]|\\.)*)\)\s*Tj"), 1)))
    unesc = F.transform(
        tjs, lambda t: F.replace(
            F.replace(F.replace(t, F.lit("\\("), F.lit("(")),
                      F.lit("\\)"), F.lit(")")),
            F.lit("\\\\"), F.lit("\\")))
    return F.array_join(unesc, "\n")


def pdf_extract_stats(documents: DataFrame,
                      boilerplate_milli: int = HTML_BOILER_MILLI
                      ) -> DataFrame:
    """Per-source extraction rollup over synthesized PDFs — the same
    (source, n_docs, n_raw_lines, n_nonempty_lines, n_boiler_dropped,
    n_kept_lines, clean_checksum) contract as ``html_extract_stats``,
    through the SHARED line/boilerplate/rollup machinery."""
    pages = synthesize_pdf(documents)
    flagged = flagged_extracted_lines(
        pages, pdf_to_text(F.col("pdf")), boilerplate_milli)
    return extract_stats_rollup(flagged)


def extract_pdf_documents(pages: DataFrame,
                          boilerplate_milli: int = HTML_BOILER_MILLI
                          ) -> DataFrame:
    """The materializing form over a (doc_id, source[, lang], pdf)
    frame: (doc_id, source[, lang], text, removed_lines) — kept lines
    rebuilt in order, boilerplate dropped; duplicate doc_ids raise
    (see ``extract_html_documents`` for the shared contract)."""
    flagged = flagged_extracted_lines(
        pages, pdf_to_text(F.col("pdf")), boilerplate_milli)
    return rebuild_extracted_documents(pages, flagged,
                                       "extract_pdf_documents")
