"""Operator-coverage queries over the driver's testdata tables.

One callable per implemented operator family from SURVEY.md §2, each taking
``sf_dir`` and returning a Dataset / pandas DataFrame / pyarrow Table. The
matching ANSI-SQL oracles live in ``__ray_entry__.oracle_sql()``; column
names are identical on both sides (the driver hash-compares values under
sorted column names).

Float policy: per-row arithmetic is bit-identical between numpy/Arrow and
DuckDB (same IEEE doubles, same ops) and is NOT rounded. Multi-row FLOAT
sums are order-sensitive in the last ulps and can flip any post-hoc
rounding at a boundary, so money/value aggregates are computed in EXACT
integer units instead: per-row scale-and-round to cents (x100) or micros
(x1e6) — unambiguous for non-tie doubles — then integer sums, identical on
both sides. Ratios derived from those integers use the same double ops on
both sides and stay bit-identical.
"""

# Package split of the former 11.5k-line queries.py (VERDICT r4 #8): one
# module per query family plus the _base substrate. The registry surface
# is unchanged — `from ...pipelines import queries as q; q.<name>` works
# for every query, and `queries()` / `oracle_sql()` keys are identical.

from . import _base
from . import tpch_a, tpch_b, eventsq, textq, graphq, dedupq, embedq, crawlq

_FAMILIES = (_base, tpch_a, tpch_b, eventsq, textq, graphq, dedupq, embedq, crawlq)

_ns = {}
for _m in _FAMILIES:
    for _k, _v in vars(_m).items():
        if not _k.startswith("__"):
            _ns[_k] = _v

# cross-link: every family module sees every query/helper name at CALL
# time (top-level names were unique in the single-file module, so there
# are no collisions — the last-write order above is irrelevant)
for _m in _FAMILIES:
    for _k, _v in _ns.items():
        if _k not in vars(_m):
            setattr(_m, _k, _v)

globals().update(_ns)
del _m, _k, _v
