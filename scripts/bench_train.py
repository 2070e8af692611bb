"""Full-depth 7B training throughput on one chip (VERDICT r2 item 3).

The single-chip training configuration is QLoRA (reference
scripts/finetune_qlora.sh: frozen quantized base + adapters + projector) —
dense 7B training needs the mesh for optimizer state (ZeRO/FSDP, measured by
dryrun only). This measures the stage-2 geometry: 32-layer 7B, seq 2048,
one image spliced (144 visual tokens), int8 frozen base, r=64 adapters on
all linears + projector, per-layer remat (TOKENPACKER_REMAT=1).

Timing is tunnel-proof: N steps chained in one jitted fori_loop over the
SAME batch with a param->loss data dependency, one scalar fetched.

Usage: python scripts/bench_train.py [batch] [seq] [layers]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TOKENPACKER_REMAT", "1")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    layers = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_steps = int(os.environ.get("STEPS", "4"))

    import dataclasses

    import optax

    from tokenpacker_tpu.config import TokenPackerVLMConfig
    from tokenpacker_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from tokenpacker_tpu.models.splice import build_splice_plan
    from tokenpacker_tpu.models.vlm import init_vlm
    from tokenpacker_tpu.train.lora import LoraConfig, init_lora, lora_train_step_factory
    from tokenpacker_tpu.utils.bench_params import int8_params_like

    cfg = TokenPackerVLMConfig()
    cfg = dataclasses.replace(
        cfg, lm=dataclasses.replace(cfg.lm, num_hidden_layers=layers)
    )
    print(f"backend={jax.default_backend()} layers={layers} B={batch} T={seq} "
          f"remat={os.environ.get('TOKENPACKER_REMAT')}", flush=True)

    # frozen int8 base in the UNFUSED layout (trainer._train_lora shape)
    shapes = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    base = int8_params_like(shapes)
    lcfg = LoraConfig(r=64, alpha=128, dropout=0.0)
    lora = init_lora(jax.random.PRNGKey(1), base, lcfg)
    trainable = (lora, base["projector"])
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    opt_state = tx.init(trainable)

    # stage-2-shaped batch: <image> + text, spliced length == seq exactly
    n_text = seq - cfg.tokens_per_view - 4
    ids = np.concatenate(
        [[1, 319, 13563], [IMAGE_TOKEN_INDEX],
         np.random.default_rng(0).integers(10, 2000, n_text)]
    ).astype(np.int64)
    labels = np.where(np.arange(len(ids)) > 10, ids, IGNORE_INDEX)
    plan = build_splice_plan(
        [ids] * batch, [[(1, 1)]] * batch, cfg.tokens_per_view, "single",
        0, 0, 0, labels=[labels] * batch, pad_to=seq,
    )
    l = plan.token_ids.shape[1]
    batch_d = {
        "images": jnp.zeros(
            (batch, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.bfloat16
        ),
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_slot": jnp.asarray(plan.image_slot),
        "positions": jnp.broadcast_to(jnp.arange(l), (batch, l)),
        "key_valid": jnp.asarray(plan.attn_mask),
        "labels": jnp.asarray(plan.labels),
    }

    step_fn = lora_train_step_factory(cfg, lcfg, tx)

    @jax.jit
    def loop(trainable, base, opt_state, batch_d, salt):
        def body(i, carry):
            trainable, opt_state, _ = carry
            trainable, opt_state, metrics = step_fn(trainable, base, opt_state, batch_d)
            return trainable, opt_state, metrics["loss"]

        trainable, opt_state, loss = jax.lax.fori_loop(
            0, n_steps, body, (trainable, opt_state, jnp.float32(salt))
        )
        return loss

    t0 = time.perf_counter()
    r = float(loop(trainable, base, opt_state, batch_d, 0))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s (loss={r:.4f})", flush=True)
    t0 = time.perf_counter()
    float(loop(trainable, base, opt_state, batch_d, 1))
    dt = time.perf_counter() - t0
    step_t = dt / n_steps
    tokens = batch * l
    # QLoRA flop estimate: fwd 2PT + dx backward 2PT (+ remat re-fwd 2PT
    # under full remat; --remat dots saves the GEMM outputs so the re-fwd
    # is elementwise-only). Adapter/projector weight grads are small.
    lm = cfg.lm
    p_lm = layers * (4 * lm.hidden_size**2 + 3 * lm.hidden_size * lm.intermediate_size)
    pt = 4 if os.environ.get("TOKENPACKER_REMAT") == "dots" else 6
    flops = pt * p_lm * tokens
    mfu = flops / step_t / 197e12
    print(f"step {step_t*1e3:.1f} ms  {tokens/step_t:.0f} tokens/s/chip  "
          f"~{mfu*100:.0f}% MFU ({pt}PT est, P={p_lm/1e9:.2f}B)", flush=True)


if __name__ == "__main__":
    main()
