from .zstd_backend import (
    MAX_CLEVEL,
    MIN_CLEVEL,
    WINDOWLOG_MAX,
    WINDOWLOG_MIN,
    SectionCompressor,
    SectionDecompressor,
    SpillingSectionCompressor,
    SpilledPayload,
    compress_section,
    compress_section_blocked,
    compress_section_device,
    compress_section_native,
    decompress_section,
    decompress_section_blocked,
    iter_decompress,
    parse_blocked_index,
)

__all__ = [
    "MAX_CLEVEL", "MIN_CLEVEL", "WINDOWLOG_MAX", "WINDOWLOG_MIN",
    "SectionCompressor", "SectionDecompressor",
    "SpillingSectionCompressor", "SpilledPayload",
    "compress_section", "compress_section_native", "compress_section_device",
    "decompress_section", "iter_decompress",
    "compress_section_blocked", "decompress_section_blocked",
    "parse_blocked_index",
]
