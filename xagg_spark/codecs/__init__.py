from .image import (decode_tile, decode_batch, encode_tile, phash64, psnr,
                    FORMATS)

__all__ = ["decode_tile", "decode_batch", "encode_tile", "phash64", "psnr",
           "FORMATS"]
