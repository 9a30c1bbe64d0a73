from .binary import (decode_meta_query, parse_image_header,
                     with_binary_payload)

__all__ = ["decode_meta_query", "parse_image_header", "with_binary_payload"]
