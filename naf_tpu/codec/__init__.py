from .zstd_backend import (
    MAX_CLEVEL,
    MIN_CLEVEL,
    WINDOWLOG_MAX,
    WINDOWLOG_MIN,
    SectionCompressor,
    SectionDecompressor,
    compress_section,
    decompress_section,
    iter_decompress,
)

__all__ = [
    "MAX_CLEVEL", "MIN_CLEVEL", "WINDOWLOG_MAX", "WINDOWLOG_MIN",
    "SectionCompressor", "SectionDecompressor",
    "compress_section", "decompress_section", "iter_decompress",
]
