"""A/B the fused decode kernel's attention cost on-chip.

Calls fused_decode_hidden directly (bypassing the serving dispatch, which
refuses to run with TOKENPACKER_FD_DEBUG set) in a chained fori_loop, with
and without TOKENPACKER_FD_DEBUG=noattn, at a given S. The delta is the
attention sub-block's cost; running two S values splits it into
S-proportional vs fixed-per-(layer,sample) parts.

Usage: python scripts/probe_fd_attention.py [batch] [s_max] [mode]
  mode: attn (default) | noattn
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    s_max = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    mode = sys.argv[3] if len(sys.argv) > 3 else "attn"
    if mode == "noattn":
        os.environ["TOKENPACKER_FD_DEBUG"] = "noattn"
    n_steps = int(os.environ.get("STEPS", "32"))

    from bench import _int8_params_on_device
    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.ops.fused_decode import fused_decode_hidden

    cfg = TokenPackerVLMConfig()
    params = _int8_params_on_device(cfg, jnp.bfloat16)
    lm = cfg.lm
    shape = (lm.num_hidden_layers, batch, s_max, lm.kv_heads, lm.head_dim)
    k = jnp.zeros(shape, jnp.bfloat16)
    v = jnp.zeros(shape, jnp.bfloat16)
    lens = jnp.full((batch,), s_max - 8, jnp.int32)
    zeros = jnp.zeros_like(lens)

    import functools

    @functools.partial(jax.jit, compiler_options={"xla_tpu_scoped_vmem_limit_kib": 65536})
    def loop(params, k, v, h0, salt):
        def body(i, carry):
            h, k, v = carry
            h, k, v = fused_decode_hidden(
                params["lm"], lm, h, k, v, lens, zeros, zeros, lens + (i % 8),
                positions=lens, interpret=False,
            )
            return h, k, v

        h, k, v = jax.lax.fori_loop(0, n_steps, body, (h0 + salt, k, v))
        return jnp.sum(h.astype(jnp.float32))

    h0 = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (batch, lm.hidden_size), jnp.bfloat16)
    t0 = time.perf_counter()
    r = float(loop(params, k, v, h0, jnp.bfloat16(0)))
    print(f"compile+first {time.perf_counter()-t0:.1f}s sum={r:.3f}", flush=True)
    t0 = time.perf_counter()
    float(loop(params, k, v, h0, jnp.bfloat16(1)))
    dt = time.perf_counter() - t0
    print(f"B={batch} S={s_max} mode={mode}: {dt/n_steps*1e3:.2f} ms/step "
          f"({dt/n_steps/lm.num_hidden_layers*1e6:.1f} us/layer)", flush=True)


if __name__ == "__main__":
    main()
