"""Declarative data-quality expectations with quarantine — the DLT
(Delta Live Tables) expectations contract in batch form.

A pipeline declares named boolean predicates over the incoming frame,
each with an action:

- ``warn``  — violating rows are KEPT; the violation only counts
  (DLT's plain ``@expect``);
- ``drop``  — violating rows leave the clean output and land in the
  quarantine frame, annotated with every rule they failed
  (``@expect_or_drop`` + the documented quarantine pattern);
- ``fail``  — any violation aborts the batch with the rule name and
  count (``@expect_or_fail``): the ingest must not proceed on data
  this broken.

Scale shape: all predicates evaluate as row-local boolean columns in
ONE projection over the scan — no per-rule passes, no UDFs — and the
metrics aggregate is a single grouped-less agg whose exchange carries
``2 x len(rules)`` longs per map partition. The clean/quarantine split
re-reads the source with complementary pushed-down filters (two scans
of the same columns; a cache would trade memory for the re-read —
callers that persist the flagged frame can, the operator does not
decide that for them).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = ["Expectation", "ExpectationViolation", "apply_expectations"]


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: str  # SQL boolean expression over the frame's columns
    action: str = "warn"  # warn | drop | fail

    def __post_init__(self):
        if self.action not in ("warn", "drop", "fail"):
            raise ValueError(
                f"expectation {self.name!r}: unknown action {self.action!r}"
            )


class ExpectationViolation(RuntimeError):
    """Raised when a ``fail``-action expectation has any violating row."""


def apply_expectations(
    df: DataFrame, rules: list[Expectation]
) -> tuple[DataFrame, DataFrame, list[dict]]:
    """Returns ``(clean, quarantine, stats)``.

    ``clean`` holds rows passing every drop- and fail-action rule
    (warn rules never remove rows); ``quarantine`` holds the dropped
    rows with a ``__violations`` array naming each drop-rule they
    failed. ``stats`` is one dict per rule — name, action, n_pass,
    n_fail — computed in a single aggregate pass (the only action this
    function triggers). A fail-action rule with violations raises
    `ExpectationViolation` BEFORE either output frame is consumed.

    NULL predicate results count as violations (SQL's CHECK semantics
    would pass them; an expectation is a quality gate, so unknowable is
    not acceptable — DLT counts NULLs as failures too).
    """
    if not rules:
        raise ValueError("apply_expectations requires at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")
    ok = {
        r.name: F.coalesce(F.expr(r.predicate), F.lit(False)) for r in rules
    }
    counts = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[
            F.sum(ok[r.name].cast("long")).alias(f"__pass_{i}")
            for i, r in enumerate(rules)
        ],
    ).first()
    total = counts["__total"] or 0
    stats = []
    for i, r in enumerate(rules):
        n_pass = counts[f"__pass_{i}"] or 0
        stats.append(
            {
                "rule": r.name,
                "action": r.action,
                "n_pass": int(n_pass),
                "n_fail": int(total - n_pass),
            }
        )
    for s, r in zip(stats, rules):
        if r.action == "fail" and s["n_fail"]:
            raise ExpectationViolation(
                f"expectation {r.name!r} (action=fail) violated by "
                f"{s['n_fail']} row(s); batch refused"
            )
    gating = [r for r in rules if r.action in ("drop", "fail")]
    keep = F.lit(True)
    for r in gating:
        keep = keep & ok[r.name]
    clean = df.filter(keep)
    droppers = [r for r in rules if r.action == "drop"]
    if droppers:
        viol = F.filter(
            F.array(*[F.when(~ok[r.name], F.lit(r.name)) for r in droppers]),
            lambda x: x.isNotNull(),
        )
    else:  # fail-only gating: nothing can reach quarantine non-empty
        viol = F.expr("CAST(array() AS ARRAY<STRING>)")
    quarantine = df.filter(~keep).withColumn("__violations", viol)
    return clean, quarantine, stats
