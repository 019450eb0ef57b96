from .stats import bh_adjust, add_rank
from .norm import cpm_log2, zscore_rows, TMM, tmm_norm_factors

__all__ = [
    "bh_adjust",
    "add_rank",
    "cpm_log2",
    "zscore_rows",
    "TMM",
    "tmm_norm_factors",
]
