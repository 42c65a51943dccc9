"""Out-of-band host-speed anchor (VERDICT r13 'Next round' #2).

Three consecutive rounds of raw-bench drift (r11-r13) were attributed
to host speed via the IN-capture per-pass canaries. That attribution is
self-referential: the canary and the panel share the capture window, so
a systematic in-capture effect (JVM state, page-cache shape) would move
both and still read as "host". This tool makes the attribution
falsifiable: it runs ONLY the canary — a fresh Spark session, the same
lineitem scan-count `bench._canary_once` times, the same min-of-2
regime — with no panel attached. Run it immediately before and after
each bench capture; if the standalone readings bracket the in-capture
per-pass canaries, the host-factor story holds independently of the
capture. If the in-capture canaries are systematically slower than the
adjacent standalone anchors, the drift is capture-coupled, not host.

Usage: python tools/canary_anchor.py [n_samples]  (default 8)
Prints one JSON line: {"anchor_min2_samples": [...], "min": .., ...}
— paste alongside the capture's perpass figure in SCALE_NOTES.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from distributed_mobility_data_pipeline_spark.session import get_spark

# THE PROTOCOL. Cross-round anchor readings are only comparable at the
# same (ramp, samples) depth — the lineitem-count path keeps speeding up
# with session depth (SCALE_NOTES r14: the 30-sample run was still
# converging after 60+ scans), so changing either constant silently
# shifts the anchor level and breaks round-over-round comparison.
# tests/test_driver_contract.py::test_canary_anchor_protocol_is_pinned
# pins both; bump them only with a SCALE_NOTES entry stating the old
# readings are no longer comparable.
RAMP_SCANS = 6
DEFAULT_SAMPLES = 8


def split_ramp(ramp_raw: list) -> tuple[list, int]:
    """Split a raw ramp series into (numeric samples, failure count).

    bench._canary_once returns None on failure; the emitted JSON keeps
    ramp_samples uniformly numeric and surfaces failures as a count
    instead (ADVICE r14) so downstream readers never see mixed types.
    """
    ramp = [s for s in ramp_raw if s is not None]
    return ramp, len(ramp_raw) - len(ramp)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_SAMPLES
    spark = get_spark("canary_anchor")
    # Ramp to bench's steady state before sampling: bench's canaries run
    # after full table warm-up + a cold pass + warm panel passes, so a
    # single throwaway count is NOT equivalent — the first anchor run
    # showed a monotone 0.169→0.105 decay across 8 samples (still
    # ramping). Six throwaway scans flatten the JIT/page-cache ramp; the
    # ramp samples are reported separately so the decay stays visible.
    ramp, ramp_failures = split_ramp(
        [bench._canary_once(spark) for _ in range(RAMP_SCANS)]
    )
    # Same explicit-None split as the ramp: `if s` would also drop a
    # legitimate 0.0 reading, and failures deserve a symmetric count
    # (ADVICE r15).
    samples, sample_failures = split_ramp(
        [bench._canary_min2(spark) for _ in range(n)]
    )
    spark.stop()
    out = {
        "ramp_samples": ramp,
        "ramp_failures": ramp_failures,
        "anchor_min2_samples": samples,
        "sample_failures": sample_failures,
        "n": len(samples),
        "min": min(samples) if samples else None,
        "median": round(statistics.median(samples), 4) if samples else None,
        "mean": round(statistics.fmean(samples), 4) if samples else None,
        "sf_dir": bench.SF_DIR,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
