from .binary import decode_meta_query, fake_decode_image, with_binary_payload

__all__ = ["decode_meta_query", "fake_decode_image", "with_binary_payload"]
