"""CLI — the reference's FsShell path (SURVEY §3 E3: `hadoop fs -ls
cfs://vol/dir`) re-expressed over the engine.

    python -m cubefs_hadoop_spark ls            <warehouse>
    python -m cubefs_hadoop_spark describe      <warehouse> <table>
    python -m cubefs_hadoop_spark stats         <warehouse> <table>
    python -m cubefs_hadoop_spark sql           <warehouse> "<query>"
    python -m cubefs_hadoop_spark query         <name> [sf_dir]
    python -m cubefs_hadoop_spark queries
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    cmd, args = argv[0], argv[1:]

    from cubefs_hadoop_spark.engine import Engine
    from cubefs_hadoop_spark.session import get_spark

    if cmd == "queries":
        from cubefs_hadoop_spark.queries import ORACLE, QUERIES

        for name in sorted(QUERIES):
            print(f"{name}  [{'oracle' if name in ORACLE else 'rows-only'}]")
        return 0

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if cmd == "ls":
            eng = Engine(spark, args[0], create=False)
            for t in eng.list_tables():
                print(t)
        elif cmd == "describe":
            Engine(spark, args[0], create=False).describe(args[1]).show(100, False)
        elif cmd == "stats":
            print(Engine(spark, args[0], create=False).table_stats(args[1]))
        elif cmd == "sql":
            Engine(spark, args[0], create=False).sql(args[1]).show(100, False)
        elif cmd == "query":
            from cubefs_hadoop_spark.queries import QUERIES

            sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
            QUERIES[args[0]](spark, sf_dir).show(100, False)
        else:
            print(__doc__)
            return 2
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
