"""Loud-cap runtime guards for "bounded if quantized" collapsed tables.

Several operators collapse the corpus to a model-sized table (distinct
contingency cells, value blocks, duration steps, period buckets) and
then run table-squared inequality joins or single-partition ordered
windows over it. Their contract is "quantize/bucket the input upstream
so the collapsed table stays model-sized" — correct for the bucketed
features real 100 TB monitoring compares, but silently catastrophic
when violated: a raw-continuous input turns the cell pair join into
cells² work and puts a corpus-sized table on ONE window reducer.

These guards make a contract violation fail LOUD: a count probe on the
already-persisted collapsed table (one cached-partition count — never a
second corpus scan) raises :class:`CollapsedTableTooLarge` past the
cap. This is the dedup family's ``DEFAULT_DF_CAP`` discipline applied
to the stats/survival/monitoring surface (round-10/11 verdict item:
"implement it, don't re-document it").

BEHAVIOR CHANGE (round 12, extended round 13) — read before upgrading:

* The caps are ON BY DEFAULT (``max_cells=10_000``; ``max_steps`` /
  ``max_blocks`` / ``max_buckets`` / ``max_values=100_000``). A
  previously-working call on a large-but-legitimate unquantized input
  now raises :class:`CollapsedTableTooLarge` instead of silently
  running; pass ``<knob>=None`` to restore the old behavior (the
  caller then owns boundedness), or a higher cap to accept a known
  table size explicitly.
* The count probe is an ACTION: the guarded operators (kendall tau,
  wasserstein_1d, kaplan_meier / log_rank_test / rmst, msprt_monitor,
  and since round 13 the rank-block family — auc, mannwhitney_u,
  ks_two_sample, effect_sizes, spearman_rho) now execute their first
  corpus scan eagerly at CALL time rather than at the first downstream
  action. The scan is not extra work — the collapsed table is
  persisted and every downstream consumer reads the cache — but
  call-site timing shifts from lazy to eager, and ``<knob>=None``
  also restores full laziness (no persist-forcing count).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)

# cell tables feeding a cells² inequality pair join (kendall): 10k
# cells is ~5·10⁷ pair terms — the knee past which the join dominates
DEFAULT_MAX_CELLS = 10_000
# step/block/bucket tables feeding single-partition ordered windows
# (wasserstein blocks, survival steps, mSPRT buckets): linear work,
# but all of it on one reducer — 100k rows is comfortably model-sized
DEFAULT_MAX_STEPS = 100_000


class CollapsedTableTooLarge(ValueError):
    """A collapsed (cell/block/step/bucket) table breached its cap —
    the input was not quantized/bucketed as the operator's documented
    contract requires."""


def probe_collapsed(
    df: DataFrame,
    cap: int | None,
    label: str,
    what: str,
    knob: str,
) -> int | None:
    """Count-probe a PERSISTED collapsed table; raise loud past ``cap``.

    The probe is an action on a table the query materializes anyway
    (the caller persists it before every downstream consumer), so it
    costs one count over cached partitions. ``cap=None`` disables the
    guard — the caller takes responsibility for boundedness.
    """
    if cap is None:
        return None
    n = df.count()
    if n > cap:
        raise CollapsedTableTooLarge(
            f"{label}: the collapsed {what} table has {n:,} rows, past "
            f"the {cap:,} cap. This operator's downstream work is "
            f"bounded by distinct {what} — quantize/bucket the input "
            f"upstream (the documented knob) so the table is "
            f"model-sized, or pass {knob}=None / a higher {knob} to "
            f"accept the cost explicitly."
        )
    _log.debug("%s: %s table bounded at %d rows (cap %d)", label, what, n, cap)
    return n
