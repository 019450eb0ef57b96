from .stats import bh_adjust, add_rank
from .norm import cpm_log2, zscore_rows, TMM, tmm_norm_factors
from .differential import EdgeR_Unpaired
from .deseq2 import DESeq2UnpairedAB, DESeq2Unpaired, DESeq2LRT
from .noiseq import NOISeq
from .vst import VST

__all__ = [
    "bh_adjust",
    "add_rank",
    "cpm_log2",
    "zscore_rows",
    "TMM",
    "tmm_norm_factors",
    "EdgeR_Unpaired",
    "DESeq2UnpairedAB",
    "DESeq2Unpaired",
    "DESeq2LRT",
    "NOISeq",
    "VST",
]
