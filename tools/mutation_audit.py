"""Oracle-mutation audit: prove the oracles DISCRIMINATE.

The in-repo gate (and the driver's t2) compares Spark output against a
DuckDB oracle — but a comparison only proves correctness if it would
FAIL for a wrong answer. This tool closes that meta-gap (the next
escalation after the round-4 empty-vs-empty and round-5
constant-vs-constant audits): for a sample of oracled queries it runs
the real comparison once to establish the green baseline, then injects
deliberate wrong-answer mutations into the SPARK result and asserts the
comparison fails for every one:

  cell_bump  — one cell changed by the smallest representable step
               (+1 int, 1-ulp float nextafter, +1s timestamp, flipped
               bool, suffixed string): catches value-hash tolerance
               that's coarser than the value domain.
  row_drop   — last row removed: catches row-count-blind compares.
  col_rename — one column renamed: catches schema-blind compares.

A mutation that still PASSES means that oracle cannot catch that class
of Spark-side bug — reported and exit 1. Zero-row outputs can't take
cell/row mutations; they are flagged as advisory (a 0-row oracled
result proves little and should justify itself).

Usage:
    python tools/mutation_audit.py [sf_dir] [n_sample|all] [name_substr ...]
    python tools/mutation_audit.py --oracle-side [sf_dir] [n|all]
                                   [name_substr ...] [--json artifact.json]

Multiple name_substr filters OR together (any match selects), so a
delta audit over an explicit name list is one command.

`--json` (oracle-side only) writes a machine-readable artifact —
queries/mutant counts, comparator-blind map (must be empty), inert
tokens, baseline failures — so the per-round audit is checked in and
diffable like the scaling sweep's.

`--oracle-side` runs the DUAL audit (see the oracle-side section below):
mutate the DuckDB SQL instead of the Spark frame, proving the oracles
are independent witnesses rather than mirrors of a shared bug.

Sampling is deterministic: registry order (the _PRIORITY sweep prefix
first — the queries the driver will check next — then the remainder),
every k-th name to spread across modules.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iris_pyspark_spark.registry import EnvironmentGated, load_all  # noqa: E402
from iris_pyspark_spark.testing import compare_frames, make_oracle_con  # noqa: E402

MUTATIONS = ("cell_bump", "row_drop", "col_rename")


def _bump_cell(pdf: pd.DataFrame) -> pd.DataFrame | None:
    """Smallest-step change to the first mutable NON-NULL cell anywhere
    in the frame, or None if no cell can take a real mutation.

    Scans every row, not just the first: a frame whose first row is all
    NaN/NaT would otherwise skip cell_bump silently — or worse, apply a
    no-op (NaT + Timedelta stays NaT) that then reads as an UNDETECTED
    mutation and falsely fails the query. NULL cells of every dtype are
    skipped; the caller emits an advisory when a non-empty frame yields
    no mutable cell so the gap is visible instead of silent."""
    if len(pdf) == 0:
        return None
    for c in sorted(pdf.columns):
        s = pdf[c]
        kind = s.dtype.kind
        for idx, v in s.items():
            if pd.isna(v):
                continue  # NaN, NaT, pd.NA, None — never a real bump
            out = None
            if kind in "iu" or (kind == "O" and isinstance(v, (int, np.integer))
                                and not isinstance(v, (bool, np.bool_))):
                out = v + 1
            elif kind == "f" or isinstance(v, (float, np.floating)):
                out = float(np.nextafter(v, np.inf))
            elif kind == "b" or isinstance(v, (bool, np.bool_)):
                out = not bool(v)
            elif kind == "M":
                out = v + pd.Timedelta(seconds=1)
            elif kind == "O" and isinstance(v, str):
                out = v + "\x01"
            else:
                break  # unmutable dtype: move to the next column
            res = pdf.copy(deep=True)
            res.loc[idx, c] = out
            return res
    return None


def mutants(pdf: pd.DataFrame):
    """Yield (mutation_name, mutated_frame) for every applicable class."""
    bumped = _bump_cell(pdf)
    if bumped is not None:
        yield "cell_bump", bumped
    if len(pdf) > 0:
        yield "row_drop", pdf.iloc[:-1].copy()
    first = sorted(pdf.columns)[0]
    yield "col_rename", pdf.rename(columns={first: first + "_mut"})


def audit(sf_dir: str, names: list[str]) -> int:
    from iris_pyspark_spark.session import get_spark

    reg = load_all()
    spark = get_spark(app_name="mutation-audit")
    con = make_oracle_con(sf_dir)
    bad: dict[str, list[str]] = {}
    advisories: list[str] = []
    baseline_fail: list[str] = []
    for i, name in enumerate(names):
        q = reg[name]
        try:
            sp = q.fn(spark, sf_dir).toPandas()
        except EnvironmentGated:
            continue
        du = con.execute(q.oracle).df()
        if not compare_frames(sp, du).ok:
            baseline_fail.append(name)
            continue
        if len(sp) == 0:
            advisories.append(f"{name}: 0-row output — only col_rename testable")
        elif _bump_cell(sp) is None:
            advisories.append(
                f"{name}: no mutable non-null cell — cell_bump not exercised"
            )
        undetected = [
            m for m, mutated in mutants(sp) if compare_frames(mutated, du).ok
        ]
        if undetected:
            bad[name] = undetected
        print(
            f"[{i + 1}/{len(names)}] {name}: "
            + ("NON-DISCRIMINATING " + ",".join(undetected) if undetected else "ok")
        )
    print()
    for a in advisories:
        print(f"ADVISORY {a}")
    for n in baseline_fail:
        print(f"BASELINE-FAIL {n} (fix the query/oracle first; not audited)")
    if bad:
        print(f"NON-DISCRIMINATING oracles ({len(bad)}):")
        for n, ms in bad.items():
            print(f"  {n}: passes despite {ms}")
        return 1
    print(
        f"mutation audit: {len(names)} queries x {len(MUTATIONS)} mutation "
        "classes — every mutation detected"
    )
    return 0 if not baseline_fail else 1


# --------------------------------------------------------------------------
# Oracle-side mutations: prove the ORACLES are independent witnesses.
#
# The Spark-side audit above proves the comparison catches a wrong Spark
# answer given a correct oracle. It cannot catch the dual failure mode: an
# oracle that accidentally MIRRORS a Spark bug (both sides sharing a wrong
# constant or an inert predicate — the round-4 "1995 date both sides"
# vacuity class). Mutating the ORACLE SQL closes it: flip a numeric literal
# or vacate a WHERE clause, re-run DuckDB, and check what happens.
#
#   * mutated oracle CHANGED its output and the comparison FAILS  → the
#     comparison is sensitive at that token: ok.
#   * mutated oracle CHANGED its output but the comparison still PASSES →
#     the comparator has a tolerance blind spot: HARD FAIL.
#   * mutated oracle output UNCHANGED → that literal/predicate is INERT at
#     this scale factor — exactly the shared-constant vacuity smell; the
#     token is reported as an advisory for triage (a guard predicate or a
#     LIMIT above the row count can be legitimately inert).
# --------------------------------------------------------------------------

ORACLE_MUTATIONS = ("const_bump", "where_vacate", "agg_swap")

_MAX_CONSTS = 4  # first N numeric literals mutated per query
_MAX_WHERES = 2  # first N WHERE clauses vacated per query


def _mask_strings(sql: str) -> str:
    """Blank out single-quoted literals (keeping length/positions) so the
    token scans below never touch dates or string constants."""
    import re

    return re.sub(r"'[^']*'", lambda m: "'" + " " * (len(m.group()) - 2) + "'", sql)


def oracle_mutants(sql: str):
    """Yield (mutation_label, mutated_sql) for the first _MAX_CONSTS
    standalone numeric literals (each bumped +1), the first _MAX_WHERES
    WHERE clauses (each vacated via `WHERE TRUE OR`, which ORs over the
    whole clause since OR binds loosest), and the first MAX(/MIN(
    aggregate swapped to its dual — the shared-wrong-aggregate mirror
    bug (both engines spelling MIN where the spec means MAX), and the
    only applicable mutation for oracles with no literal and no WHERE
    (plain scans, collect profiles, argmax shapes)."""
    import re

    masked = _mask_strings(sql)
    m = re.search(r"\b(MAX|MIN)\s*\(", masked, flags=re.IGNORECASE)
    if m:
        swapped = "MIN" if m.group(1).upper() == "MAX" else "MAX"
        yield (
            f"agg_swap[{m.group(1).upper()}@{m.start(1)}]",
            sql[: m.start(1)] + swapped + sql[m.end(1) :],
        )
    n = 0
    for m in re.finditer(r"(?<![\w.$])(\d+(?:\.\d+)?)(?![\w.])", masked):
        if n >= _MAX_CONSTS:
            break
        n += 1
        lit = m.group(1)
        bumped = (
            str(int(lit) + 1) if "." not in lit else repr(float(lit) + 1.0)
        )
        yield (
            f"const_bump[{lit}@{m.start(1)}]",
            sql[: m.start(1)] + bumped + sql[m.end(1) :],
        )
    n = 0
    for m in re.finditer(r"\bWHERE\b", masked, flags=re.IGNORECASE):
        if n >= _MAX_WHERES:
            break
        n += 1
        yield (
            f"where_vacate[@{m.start()}]",
            sql[: m.end()] + " TRUE OR" + sql[m.end() :],
        )


_MUTANT_TIMEOUT_S = 20.0


class _WatchdogTimeout(RuntimeError):
    """A mutant ran past _MUTANT_TIMEOUT_S and was interrupted by the
    watchdog (as opposed to failing on its own or a user Ctrl-C)."""


def _execute_bounded(con, sql: str):
    """Execute oracle SQL under a watchdog. A mutation can turn a
    terminating query into a non-terminating one — vacating the
    recursion-stop WHERE of a recursive CTE makes DuckDB spin forever,
    and embedded DuckDB ignores KeyboardInterrupt while inside C++ —
    so a timer thread calls con.interrupt() after _MUTANT_TIMEOUT_S
    (the real oracles all finish in well under a second at sf0.01).
    Raises whatever interrupt/execution error DuckDB surfaces, with
    `fired=True` recorded on the returned marker when the watchdog was
    the cause. The interrupt is guarded by a still-running flag checked
    INSIDE the timer callback: without it, a timer firing in the gap
    between .df() returning and t.cancel() would interrupt the idle
    shared connection and abort the NEXT query on it (ADVICE r08).

    Residual race (ADVICE r09): a timer can still pass the running
    check in the instant between .df() returning and the finally block,
    setting fired=True and interrupting the now-idle connection while
    THIS call returns normally. DuckDB latches the interrupt and aborts
    the NEXT execution on the connection — which belongs to a different
    mutant with fired=False, miscounting it (or, on builds where the
    interrupt surfaces as KeyboardInterrupt, aborting the whole audit).
    So when fired=True but execute() returned normally, we join the
    timer thread (guaranteeing interrupt() has been issued, not merely
    scheduled) and drain the latched interrupt with a trivial SELECT 1,
    swallowing only the interrupt error it soaks up."""
    import threading

    state = {"running": True, "fired": False}
    lock = threading.Lock()

    def _maybe_interrupt():
        with lock:
            if not state["running"]:
                return
            state["fired"] = True
        con.interrupt()

    t = threading.Timer(_MUTANT_TIMEOUT_S, _maybe_interrupt)
    t.start()
    completed = False
    try:
        result = con.execute(sql).df()
        completed = True
        return result
    except BaseException as e:
        # Only the watchdog's own interrupt() is a timeout; a real user
        # Ctrl-C (KeyboardInterrupt with fired=False) must propagate
        # and abort the audit instead of being logged as an advisory.
        if state["fired"]:
            raise _WatchdogTimeout(sql) from e
        raise
    finally:
        with lock:
            state["running"] = False
        t.cancel()
        if completed and state["fired"]:
            # Stray interrupt landed after a normal completion: it is
            # latched on the shared connection and would poison the
            # next mutant. Wait for the callback to finish issuing it,
            # then soak it up on a throwaway statement.
            t.join()
            try:
                con.execute("SELECT 1").fetchall()
            except Exception:
                pass  # the drain absorbed the latched interrupt


def audit_oracle_side(
    sf_dir: str, names: list[str], json_out: str | None = None
) -> int:
    from iris_pyspark_spark.session import get_spark

    reg = load_all()
    spark = get_spark(app_name="mutation-audit-oracle")
    con = make_oracle_con(sf_dir)
    blind: dict[str, list[str]] = {}  # changed output, comparison passed
    inert: dict[str, list[str]] = {}  # mutation was a semantic no-op
    baseline_fail: list[str] = []
    no_mutation: list[str] = []
    timeouts: dict[str, list[str]] = {}  # mutant ran past the watchdog
    n_mut = n_err = 0
    for i, name in enumerate(names):
        q = reg[name]
        try:
            sp = q.fn(spark, sf_dir).toPandas()
        except EnvironmentGated:
            continue
        du = con.execute(q.oracle).df()
        if not compare_frames(sp, du).ok:
            baseline_fail.append(name)
            continue
        applied = 0
        for label, msql in oracle_mutants(q.oracle):
            try:
                dm = _execute_bounded(con, msql)
            except _WatchdogTimeout:
                timeouts.setdefault(name, []).append(label)
                n_err += 1
                continue
            except Exception:
                n_err += 1  # mutant SQL invalid (e.g. bumped a divisor
                continue  # into an overflow) — inapplicable, not evidence
            applied += 1
            n_mut += 1
            changed = not compare_frames(dm, du).ok
            detected = not compare_frames(sp, dm).ok
            if changed and not detected:
                blind.setdefault(name, []).append(label)
            elif not changed:
                inert.setdefault(name, []).append(label)
        if applied == 0:
            no_mutation.append(name)
        status = (
            "COMPARATOR-BLIND " + ",".join(blind[name])
            if name in blind
            else f"ok ({applied} mutants"
            + (f", {len(inert.get(name, []))} inert" if name in inert else "")
            + ")"
        )
        print(f"[{i + 1}/{len(names)}] {name}: {status}", flush=True)
    print()
    for n_ in no_mutation:
        print(f"ADVISORY {n_}: no applicable oracle mutation (no literal/WHERE)")
    for n_, labels in sorted(inert.items()):
        print(f"ADVISORY {n_}: inert at this sf — {', '.join(labels)}")
    for n_, labels in sorted(timeouts.items()):
        print(
            f"ADVISORY {n_}: mutant interrupted at {_MUTANT_TIMEOUT_S}s "
            f"(non-terminating under mutation) — {', '.join(labels)}"
        )
    for n_ in baseline_fail:
        print(f"BASELINE-FAIL {n_} (fix the query/oracle first; not audited)")
    if json_out is not None:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(names),
                    "n_mutants": n_mut,
                    "n_inapplicable": n_err,
                    "comparator_blind": blind,
                    "inert": inert,
                    "no_mutation": no_mutation,
                    "timeouts": timeouts,
                    "baseline_fail": baseline_fail,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"artifact written: {json_out}")
    if blind:
        print(f"COMPARATOR-BLIND oracle mutations ({len(blind)}):")
        for n_, labels in blind.items():
            print(f"  {n_}: output changed yet comparison passed — {labels}")
        return 1
    print(
        f"oracle-side audit: {len(names)} queries, {n_mut} mutants executed "
        f"({n_err} inapplicable), 0 comparator-blind; "
        f"{sum(len(v) for v in inert.values())} inert tokens "
        f"across {len(inert)} queries (see advisories)"
    )
    return 0 if not baseline_fail else 1


def pick_sample(n: int | None, substrs: list[str]) -> list[str]:
    """Oracled query names matching ANY of `substrs` (all if empty),
    every-k-th downsampled to n. Multiple filters make delta audits
    (e.g. 'exactly the queries added since the last full pass') one
    command, same as preflight's name-list argument."""
    reg = load_all()
    oracled = [
        m
        for m, q in reg.items()
        if q.oracle is not None and (not substrs or any(s in m for s in substrs))
    ]
    if n is None or n >= len(oracled):
        return oracled
    step = max(1, len(oracled) // n)
    return oracled[::step][:n]


def main() -> int:
    json_out = None
    raw = sys.argv[1:]
    if "--json" in raw:
        i = raw.index("--json")
        json_out = raw[i + 1]
        raw = raw[:i] + raw[i + 2 :]
    argv = [a for a in raw if a != "--oracle-side"]
    oracle_side = "--oracle-side" in raw
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    n_arg = argv[1] if len(argv) > 1 else ("30" if oracle_side else "50")
    substrs = argv[2:]
    n = None if n_arg == "all" else int(n_arg)
    names = pick_sample(n, substrs)
    if oracle_side:
        return audit_oracle_side(sf_dir, names, json_out=json_out)
    return audit(sf_dir, names)


if __name__ == "__main__":
    raise SystemExit(main())
