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


_SIZE_SUFFIXES = {
    "k": 1024, "kb": 1024,
    "m": 1024**2, "mb": 1024**2,
    "g": 1024**3, "gb": 1024**3,
    "t": 1024**4, "tb": 1024**4,
    "b": 1,
}


def _normalize_conf_value(v: str) -> str:
    """Canonicalize the value forms Spark is known to normalize in its
    conf echo — boolean case ('True' → 'true') and byte-size suffixes
    ('1g' → '1073741824b' → the byte count) — so the echo check compares
    semantics, not spelling. Anything unrecognized passes through
    lowercased/stripped."""
    s = str(v).strip().lower()
    if s in ("true", "false"):
        return s
    for suffix in sorted(_SIZE_SUFFIXES, key=len, reverse=True):
        if s.endswith(suffix):
            num = s[: -len(suffix)]
            if num.isdigit():
                return str(int(num) * _SIZE_SUFFIXES[suffix])
    if s.isdigit():
        return s
    return s


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--lenient"]
    lenient = "--lenient" in sys.argv[1:]
    sf_dir, conf = parse_args(argv)
    if not conf:
        print("no axis configs given; refusing to run a default sweep", file=sys.stderr)
        return 2
    spark = get_spark("axis_sweep", extra_conf=conf)
    for k, v in conf.items():
        got = spark.conf.get(k, None)
        print(f"axis conf {k} = {got}")
        if got is None:
            print(f"FATAL: axis conf {k} did not take (got None)", file=sys.stderr)
            return 2
        # Spark normalizes value SPELLING (boolean case, size suffixes);
        # normalize both sides and abort on a residual SEMANTIC mismatch
        # — e.g. a static/immutable conf echoing its old stored value —
        # which means the sweep would attribute results to a
        # configuration that never applied (ADVICE r19: the r18 warn-
        # always downgrade let exactly that slip). --lenient restores
        # warn-only for deliberate experiments with echo-rewriting confs.
        if _normalize_conf_value(got) != _normalize_conf_value(v):
            msg = f"axis conf {k} echoed {got!r} (asked {v!r}) — semantic mismatch"
            if lenient:
                print(f"WARNING: {msg} (--lenient)", file=sys.stderr)
            else:
                print(f"FATAL: {msg}; pass --lenient to proceed anyway", file=sys.stderr)
                return 2
    import verify_local

    return verify_local.main(sf_dir=sf_dir, only=())


if __name__ == "__main__":
    raise SystemExit(main())
