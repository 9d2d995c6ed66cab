"""Dump .explain("formatted") for named gates (or all) to a directory.

    python scripts/plan_dump.py OUTDIR [gate1 gate2 ...] [--suffix _before]

Plans are built against $SPARK_GRAFT_SF_DIR (default sf0.1). Building a
plan may execute fixture-building side jobs (memoized index gates) but
does not execute the query itself.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    suffix = ""
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i:i + 2]
    outdir = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs(outdir, exist_ok=True)
    from moloch_spark.registry import all_queries
    from moloch_spark.session import get_spark

    spark = get_spark("plan_dump", cpus=cpus)
    q = all_queries()
    if not names:
        names = list(q)
    for name in names:
        try:
            df = q[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN FAILED: {type(exc).__name__}: {exc}"
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, flush=True)


if __name__ == "__main__":
    main()
