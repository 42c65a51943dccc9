"""Invariance-axis sweep runner.

Pre-seeds the engine's SparkSession with the axis configs given on the
command line (``k=v`` pairs), then delegates to ``verify_local.main()``
— because ``get_spark`` uses ``getOrCreate``, every query in the sweep
runs under the axis settings while the DuckDB oracle side is untouched.
This is the exact pre-seeded-session protocol the r14-r18 SCALE_NOTES
sweeps used ad hoc, made repeatable.

Usage:
    python tools/axis_sweep.py [sf_dir] k=v [k=v ...]

Example (forced-spill axis):
    python tools/axis_sweep.py /root/testdata/sf0.01 \
        spark.sql.windowExec.buffer.spill.threshold=64
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_mobility_data_pipeline_spark.session import get_spark


def parse_args(args: list[str]) -> tuple[str, dict[str, str]]:
    """Split argv into (sf_dir, axis confs). The first arg is the sf dir
    only when it is not a ``k=v`` pair; everything else must be ``k=v``."""
    args = list(args)
    sf_dir = "/root/testdata/sf0.01"
    if args and "=" not in args[0]:
        sf_dir = args.pop(0)
        if not os.path.isdir(sf_dir):
            # a mistyped conf missing its '=value' must not be silently
            # consumed as the data dir (ADVICE r18)
            raise ValueError(
                f"first argument {sf_dir!r} is neither a k=v conf nor an "
                "existing sf directory"
            )
    for a in args:
        if "=" not in a:
            raise ValueError(f"axis conf {a!r} is not a k=v pair")
    return sf_dir, dict(a.split("=", 1) for a in args)


def main() -> int:
    sf_dir, conf = parse_args(sys.argv[1:])
    if not conf:
        print("no axis configs given; refusing to run a default sweep", file=sys.stderr)
        return 2
    spark = get_spark("axis_sweep", extra_conf=conf)
    for k, v in conf.items():
        got = spark.conf.get(k, None)
        print(f"axis conf {k} = {got}")
        # Spark may normalize values (boolean case, size suffixes) —
        # compare case-insensitively and only WARN on residual
        # mismatch, printing both values (ADVICE r18: a normalized
        # echo must not abort a sweep whose conf actually took)
        if got is None:
            print(f"FATAL: axis conf {k} did not take (got None)", file=sys.stderr)
            return 2
        if str(got).strip().lower() != v.strip().lower():
            print(
                f"WARNING: axis conf {k} echoed {got!r} (asked {v!r}) — "
                "possibly normalized; verify manually",
                file=sys.stderr,
            )
    import verify_local

    return verify_local.main(sf_dir=sf_dir, only=())


if __name__ == "__main__":
    raise SystemExit(main())
