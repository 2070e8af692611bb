"""B=1 fused-decode ablation ledger (VERDICT r4 #2).

Re-runs the FD_DEBUG chain ablations at B=1 S=512 int8 weights + int8 KV
(the serving configuration whose residual gap to the 819 GB/s spec ideal
was attributed only in prose), plus the round-5 `notail` ablation that
prices the OUT-OF-KERNEL tail (final RMSNorm → lm_head (~130 MB int8 read
per step, not on the ring) → sample dispatches).

Each ablation stubs one section (numerics are wrong under any of them);
differences of ms/step attribute the measured step time:

  baseline          the real step
  notail            skip final-norm + lm_head + real logits
  noattn            skip the whole in-kernel attention section
  noattn,notail     GEMV chain alone (weight-streaming floor)
  nologit/noctx/nosm  attention sub-pieces
  nodma             compute-only (ring DMAs skipped, dots read stale slots)

Usage: python scripts/bench_fd_ablation.py [batch=1] [config ...]
"""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

CONFIGS = [
    ("baseline", "1", ""),
    ("notail", "debug", "notail"),
    ("noattn", "debug", "noattn"),
    ("noattn_notail", "debug", "noattn,notail"),
    ("nologit", "debug", "nologit"),
    ("noctx", "debug", "noctx"),
    ("nosm", "debug", "nosm"),
    ("nodma", "debug", "nodma"),
]


def main():
    from tokenpacker_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    only = sys.argv[2:]
    os.environ["TOKENPACKER_KV_CACHE"] = "int8"

    spec = importlib.util.spec_from_file_location(
        "bench_fused_decode",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_fused_decode.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    results = {}
    for name, fused, dbg in CONFIGS:
        if only and name not in only:
            continue
        os.environ["TOKENPACKER_FUSED_DECODE"] = fused
        if dbg:
            os.environ["TOKENPACKER_FD_DEBUG"] = dbg
        else:
            os.environ.pop("TOKENPACKER_FD_DEBUG", None)
        jax.clear_caches()
        print(f"[{name}] fused={fused} dbg={dbg!r}", flush=True)
        tps, ms = mod.bench(batch)
        results[name] = round(ms, 2)
        print(f"[{name}] {ms:.2f} ms/step ({tps:.1f} tok/s)", flush=True)
    os.environ.pop("TOKENPACKER_FD_DEBUG", None)
    print(json.dumps({"fd_ablation_b%d_ms" % batch: results}, indent=1))


if __name__ == "__main__":
    main()
