"""Round-4 measurement battery in ONE process (one TPU claim).

Each fresh python process negotiates a fresh chip claim through the axon
relay, and a claim can be lost if a previous client died recently — so all
round-4 TPU measurements run here sequentially inside one interpreter:

  1. env      — env-lit scene wall-clock vs the reference binary
  2. bench16  — the headline 16-spp production-multisample metric
  3. bwd x3   — 1080p fwd+bwd rate on conductors / alt2 / spotareaml
  4. gradcheck— full-depth kernel-vs-wavefront gradient diffs (3 scenes)
  5. inverse  — 800x800 multisampled inverse rendering (Adam)
  6. spp1     — legacy 1-spp bridge metric
  7. stream   — 524k-face HBM-streamed terrain vs the jnp BVH fallback
                (last: its fallback leg once crashed the TPU worker)

Usage:  python tools/r4_measure.py [section ...]   (default: all)
Output: one section per block to stdout; also appended as JSON lines to
tools/artifacts/r4_measurements.jsonl.
"""

from __future__ import annotations

import contextlib
import json
import os
import pathlib
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CLAIM THE CHIP FIRST: the axon grant expires if the process doesn't touch
# the device shortly after interpreter start ("grant unclaimed past timeout
# — client lost"); any section that does seconds of host work (e.g. a
# 524k-face BVH build) before its first device op would otherwise hang
# forever on the claim futex.
import jax
import jax.numpy as _jnp

_claim = (_jnp.ones((8, 128)) * 2.0).sum()
_claim.block_until_ready()
print(f"device claimed: {jax.devices()}", flush=True)

import numpy as np

ART = pathlib.Path(__file__).parent / "artifacts"
ART.mkdir(exist_ok=True)
REC = ART / "r4_measurements.jsonl"


def record(kind: str, **kv) -> None:
    row = {"kind": kind, **kv}
    print(f"[{kind}] {json.dumps(kv)}", flush=True)
    with REC.open("a") as fh:
        fh.write(json.dumps(row) + "\n")


@contextlib.contextmanager
def argv(*args):
    old = sys.argv
    sys.argv = ["x", *args]
    try:
        yield
    finally:
        sys.argv = old


def sec_stream() -> None:
    with argv("--stream"):
        import tools.tpu_verify as tv

        tv.main()


def sec_env() -> None:
    with argv("--env"):
        import tools.tpu_verify as tv

        tv.main()


def sec_bench16() -> None:
    import bench

    bench.main(spp1=False)


def sec_spp1() -> None:
    import bench

    bench.main(spp1=True)


def sec_bwd() -> None:
    import bench

    for scene in ("conductors", "alt2", "spotareaml", "pt"):
        with argv("--bwd", "--bwd-scene", scene):
            bench.main_bwd()


def sec_gradcheck() -> None:
    with argv("--bwd"):
        import tools.tpu_verify as tv

        tv.main()


def sec_inverse() -> None:
    with argv():
        import tools.inverse_render as ir

        ir.main()


# stream runs LAST: its jnp-fallback comparison has crashed the TPU worker
# process at full scale before (a dead worker fails every later section)
SECTIONS = {
    "env": sec_env,
    "bench16": sec_bench16,
    "bwd": sec_bwd,
    "gradcheck": sec_gradcheck,
    "inverse": sec_inverse,
    "spp1": sec_spp1,
    "stream": sec_stream,
}


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")] \
        or list(SECTIONS)
    for name in names:
        print(f"\n===== {name} =====", flush=True)
        t0 = time.perf_counter()
        try:
            SECTIONS[name]()
            record(name + ".done", wall_s=round(time.perf_counter() - t0, 2))
        except Exception:  # noqa: BLE001 — keep later sections alive
            traceback.print_exc()
            record(name + ".FAILED",
                   wall_s=round(time.perf_counter() - t0, 2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
