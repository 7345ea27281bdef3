"""Round-7 verdict #8 probe: bigram-LM scoring on both sides of the
broadcast cliff.

SCALING.md claims the `bigram_lm_score` plan "degrades gracefully to a
hash shuffle join" when the bigram count table outgrows the broadcast
threshold. MEASURE it: run the identical operator (a) at the default
autoBroadcastJoinThreshold and (b) with broadcast disabled
(threshold = -1), record wall + which strategy ACTUALLY ran. Each
timed repeat executes a fresh DataFrame's OWN physical plan and reads
the strategy from that same now-final adaptive plan — count() builds
a separate column-pruned QueryExecution whose AQE decision can differ
near the cliff, and an earlier cut of this probe mislabeled runs that
way. Measured result: AQE broadcasts at runtime at every probe size
(even where the static estimate picks sort-merge), and the forced
shuffle side costs LESS wall on this host — the degradation past the
real cliff is free.

    python tools/lm_broadcast_probe.py [--sizes 20000 80000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[20_000, 80_000])
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import text as tx
    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark
    from tools.scaling_bench import synth_docs

    # get_spark: the bare-builder session's 1g default driver heap
    # OOMs when the 80k-doc physical plan executes unpruned
    spark = get_spark(
        "lm_broadcast_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    thresholds = {
        "broadcast": None,  # session default: count tables broadcast
        "shuffle": "-1",    # past the cliff: hash shuffle join forced
    }
    results: dict[tuple[str, int], float] = {}
    strategies: dict[tuple[str, int], str] = {}
    for n in args.sizes:
        docs = synth_docs(spark, n).persist()
        docs.count()
        for side, thr in thresholds.items():
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            if thr is not None:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
            try:
                # Time and label the SAME executions: each repeat
                # builds a fresh DataFrame, runs ITS OWN physical plan
                # (count() would build a separate, column-pruned QE
                # whose AQE decision can differ near the cliff — the
                # label would then describe a plan the walls never
                # ran), reads the strategy from that now-final
                # adaptive plan, and requires every repeat to agree.
                # executedPlan().execute() avoids collecting rows to
                # the driver (collect() OOMed at 80k docs).
                best = None
                seen: set[str] = set()
                for _ in range(max(1, args.repeat)):
                    out = tx.bigram_lm_score(docs)
                    qe = out._jdf.queryExecution()
                    t0 = time.monotonic()
                    qe.executedPlan().execute().count()
                    dt = time.monotonic() - t0
                    best = dt if best is None else min(best, dt)
                    plan = qe.executedPlan().toString()
                    assert "isFinalPlan=true" in plan, "plan did not execute"
                    seen.add(
                        "broadcast" if "BroadcastHashJoin" in plan else "shuffle"
                    )
                assert len(seen) == 1, f"repeats disagreed on strategy: {seen}"
                if side == "shuffle":
                    assert seen == {"shuffle"}, (
                        "threshold=-1 must push every LM join past the "
                        "broadcast cliff"
                    )
                strategies[(side, n)] = seen.pop()
                results[(side, n)] = best
                print(
                    f"{side:>10} n={n:6d} wall={best:.2f}s "
                    f"ran_as={strategies[(side, n)]}"
                )
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        docs.unpersist()

    lines = [
        "| docs | default threshold (ran as) | threshold=-1 (ran as) | ratio |",
        "|---|---|---|---|",
    ]
    for n in args.sizes:
        b, s = results[("broadcast", n)], results[("shuffle", n)]
        lines.append(
            f"| {n:,} | {b:.2f}s ({strategies[('broadcast', n)]}) "
            f"| {s:.2f}s ({strategies[('shuffle', n)]}) | {s / b:.2f}× |"
        )
    if len(args.sizes) >= 2:
        n0, n1 = args.sizes[0], args.sizes[-1]
        for side in ("broadcast", "shuffle"):
            marg = (results[(side, n1)] - results[(side, n0)]) / (n1 - n0) * 1e6
            lines.append(f"<!-- {side} marginal: {marg:.1f} us/doc -->")
    print("\n".join(lines))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
