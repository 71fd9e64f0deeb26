from .constants import (
    IN_FORMAT_FASTA,
    IN_FORMAT_FASTQ,
    IN_FORMAT_UNKNOWN,
    NAF_MAGIC,
    SEQ_TYPE_DNA,
    SEQ_TYPE_NAMES,
    SEQ_TYPE_PROTEIN,
    SEQ_TYPE_RNA,
    SEQ_TYPE_TEXT,
    ZSTD_FRAME_MAGIC,
)
from .container import NafArchive, NafFormatError, NafHeader, NafReader, Section, naf_bytes, write_naf
from .vle import VleError, decode_vle, encode_vle, read_vle

__all__ = [
    "IN_FORMAT_FASTA", "IN_FORMAT_FASTQ", "IN_FORMAT_UNKNOWN",
    "NAF_MAGIC", "ZSTD_FRAME_MAGIC",
    "SEQ_TYPE_DNA", "SEQ_TYPE_RNA", "SEQ_TYPE_PROTEIN", "SEQ_TYPE_TEXT", "SEQ_TYPE_NAMES",
    "NafArchive", "NafFormatError", "NafHeader", "NafReader", "Section",
    "naf_bytes", "write_naf",
    "VleError", "decode_vle", "encode_vle", "read_vle",
]
