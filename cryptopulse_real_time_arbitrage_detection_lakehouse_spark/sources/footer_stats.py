"""Parquet-footer → Delta per-file stats, as a SELF-CONTAINED module.

`file_stats` turns one parquet footer (a `pyarrow.parquet.FileMetaData`)
into the Delta data-skipping stats payload (PROTOCOL.md 'Per-file
Statistics'). It lives in its own stdlib-only module for the same reason
the DV codec does (`sources/dv.py`): the footer reads DISTRIBUTE across
executors for million-file tables (`recompute_stats(spark=...)`,
`convert_from_parquet(spark=...)`), and a foreign driver that only
sys.path-inserts the repo has Python workers that cannot import the
package — so `sources/delta.py` registers this module for BY-VALUE
cloudpickle serialization and the executor closure carries the code
itself.

Reference parity note: the reference engine has no stats subsystem at
all (716 LoC, no Delta client); this implements the public Delta
PROTOCOL.md stats contract from scratch.
"""

from __future__ import annotations


def file_stats(md) -> dict:
    """Delta per-file stats from a parquet footer: numRecords plus
    min/max/nullCount per column (the data-skipping payload —
    PROTOCOL.md 'Per-file Statistics'). NESTED STRUCT fields nest in the
    stats JSON exactly as the spec prescribes ({"s": {"x": 1}}), so
    skipping works on clustering keys inside structs; paths through
    array/map elements and columns whose footer stats are absent in any
    row group or of a type without a total-order JSON encoding (bytes,
    decimals) are omitted — skipping must only ever prune files it can
    PROVE empty for a predicate."""
    import datetime

    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    bad: set[str] = set()

    def enc(v):
        if isinstance(v, bool) or v is None:
            return None  # booleans: not worth a skipping entry
        if isinstance(v, (int, str)):
            return v
        if isinstance(v, float):
            return None if v != v else v  # NaN-poisoned stats: drop
        if isinstance(v, (datetime.datetime, datetime.date)):
            # space separator so stats compare lexicographically against
            # SQL literals ('2026-01-02 03:04:05')
            return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
        return None

    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            if name in bad:
                continue
            if "." in name and any(
                seg in ("list", "element", "key_value", "key", "value")
                for seg in name.split(".")
            ):
                continue  # array/map interior: no stats contract
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                continue
            try:
                # pyarrow raises for types it cannot cast statistics for
                # (e.g. decimals) even when has_min_max is true
                lo, hi = enc(st.min), enc(st.max)
            except Exception:
                bad.add(name)
                continue
            if lo is None or hi is None:
                bad.add(name)
                continue
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    for name in bad:
        mins.pop(name, None)
        maxs.pop(name, None)
        nulls.pop(name, None)

    def nest(flat: dict) -> dict:
        out: dict = {}
        for k, v in flat.items():
            cur = out
            parts = k.split(".")
            for seg in parts[:-1]:
                cur = cur.setdefault(seg, {})
                if not isinstance(cur, dict):  # pragma: no cover
                    break
            else:
                cur[parts[-1]] = v
        return out

    out: dict = {"numRecords": md.num_rows}
    if mins:
        out["minValues"] = nest(mins)
        out["maxValues"] = nest(maxs)
        out["nullCount"] = nest(nulls)
    return out
