"""Training driver: two-stage recipe, sharded state, orbax checkpoints.

Reference parity (SURVEY.md §2.3):
- stage 1 `pretrain` (scripts/v1_5/pretrain.sh): projector-only, lr 1e-3,
  `--version plain`; saves adapter-only `mm_projector.bin`
  (llava_trainer.py:239-264, train.py:184-220)
- stage 2 `finetune` (finetune.sh): LLM+projector, lr 2e-5, `--version v1`,
  optional separate mm_projector_lr; full checkpoint
- HD variants add patch_num + image_aspect_ratio slice (pretrain_hd.sh)
- resume from latest checkpoint-* if present (train.py:990-993)

TPU-native: one jitted SPMD step over the ('data','model') mesh; ZeRO-3
equivalent comes from NamedShardings on params/opt state; checkpoints via
orbax (async-capable), plus reference-format `mm_projector.bin` export for
interchange with the torch ecosystem.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import re
import time
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from tokenpacker_tpu.config import TokenPackerVLMConfig
from tokenpacker_tpu.data.dataset import LengthGroupedSampler, SupervisedDataset, collate
from tokenpacker_tpu.parallel.mesh import make_mesh
from tokenpacker_tpu.parallel.sharding import shard_params, vlm_param_shardings
from tokenpacker_tpu.train.step import TrainConfig, make_optimizer, make_train_step
from tokenpacker_tpu.utils.logging_utils import build_logger

logger = build_logger("train", "train.log")


@dataclass
class RunConfig:
    output_dir: str = "./checkpoints/run"
    num_train_epochs: int = 1
    per_device_batch_size: int = 16
    save_steps: int = 500
    save_total_limit: int = 1
    # async checkpointing: save() returns after the synchronous device→host
    # copy; the disk write overlaps subsequent train steps (orbax
    # AsyncCheckpointer). Replaces the reference's blocking HF Trainer saves.
    async_save: bool = True
    logging_steps: int = 1
    group_by_modality_length: bool = False
    seed: int = 42
    tp: int = 1
    seq_pad_to: int = 2048
    # quantized/LoRA training (reference train.py:827-874): bits 8/4
    # quantize the frozen base; lora trains adapters + projector only
    bits: int = 16
    lora: object = None  # train.lora.LoraConfig | None


def _latest_checkpoint(output_dir: str) -> str | None:
    cands = glob.glob(os.path.join(output_dir, "checkpoint-*"))
    steps = [(int(m.group(1)), p) for p in cands if (m := re.search(r"checkpoint-(\d+)$", p))]
    return max(steps)[1] if steps else None


class Trainer:
    def __init__(
        self,
        cfg: TokenPackerVLMConfig,
        tcfg: TrainConfig,
        rcfg: RunConfig,
        params,
        dataset: SupervisedDataset,
        tokenizer,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        self.rcfg = rcfg
        self.dataset = dataset
        self.tokenizer = tokenizer
        self.mesh = make_mesh(tp=rcfg.tp)
        self.step_fn = None
        self.params = params
        self.sep_id = tokenizer.convert_tokens_to_ids(",")
        self.ret_id = tokenizer.convert_tokens_to_ids("\n")
        self.pad_id = tokenizer.pad_token_id or 0

        import orbax.checkpoint as ocp

        self.ckptr = ocp.StandardCheckpointer()

    # -- data --------------------------------------------------------------

    def _batches(self):
        rcfg = self.rcfg
        n_dev = self.mesh.shape["data"]
        global_bs = rcfg.per_device_batch_size * n_dev
        if len(self.dataset) < global_bs:
            raise ValueError(
                f"dataset ({len(self.dataset)} samples) smaller than one global "
                f"batch ({rcfg.per_device_batch_size} x {n_dev} devices = "
                f"{global_bs}); training would silently run zero steps"
            )
        if rcfg.group_by_modality_length:
            sampler = LengthGroupedSampler(
                rcfg.per_device_batch_size,
                n_dev,
                self.dataset.modality_lengths,
                group_by_modality=True,
                seed=rcfg.seed,
            )
            order = list(iter(sampler))
        else:
            order = np.random.default_rng(rcfg.seed).permutation(len(self.dataset)).tolist()
        for i in range(0, len(order) - global_bs + 1, global_bs):
            items = [self.dataset[j] for j in order[i : i + global_bs]]
            yield collate(
                items,
                self.cfg.tokens_per_view,
                self.sep_id,
                self.ret_id,
                self.pad_id,
                pad_to=self.rcfg.seq_pad_to,
            )

    # -- checkpointing -----------------------------------------------------

    def save_checkpoint(self, step: int, opt_state=None):
        out = os.path.join(self.rcfg.output_dir, f"checkpoint-{step}")
        os.makedirs(out, exist_ok=True)
        if self.tcfg.stage == "pretrain":
            # adapter-only: reference-format mm_projector.bin
            self.save_mm_projector(os.path.join(out, "mm_projector.bin"))
        else:
            state = {"params": self.params, "step": step}
            if opt_state is not None:
                state["opt_state"] = opt_state
            # One save in flight at a time. Orbax copies arrays to host
            # synchronously inside save() (so the train step's donated
            # buffers are safe to reuse immediately); only the disk write
            # runs in the background thread — training overlaps the IO.
            self.ckptr.wait_until_finished()
            self.ckptr.save(
                os.path.abspath(os.path.join(out, "state")), state, force=True
            )
            if not self.rcfg.async_save:
                self.ckptr.wait_until_finished()
        self._prune_checkpoints()
        logger.info(f"saved checkpoint-{step}"
                    + (" (writing in background)" if self.rcfg.async_save
                       and self.tcfg.stage != "pretrain" else ""))

    def finish_pending_saves(self):
        """Block until any in-flight async checkpoint write has committed
        (call before process exit or before reading the checkpoint back)."""
        self.ckptr.wait_until_finished()

    def save_mm_projector(self, path: str):
        from tokenpacker_tpu.io.hf_import import export_tokenpacker

        sd = export_tokenpacker(jax.device_get(self.params["projector"]))
        sd = {f"model.mm_projector.{k}": v for k, v in sd.items()}
        try:
            import torch

            torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, path)
        except ImportError:
            np.savez(path + ".npz", **sd)

    def _prune_checkpoints(self):
        cands = sorted(
            glob.glob(os.path.join(self.rcfg.output_dir, "checkpoint-*")),
            key=lambda p: int(re.search(r"checkpoint-(\d+)$", p).group(1)),
        )
        while len(cands) > self.rcfg.save_total_limit:
            victim = cands.pop(0)
            import shutil

            shutil.rmtree(victim, ignore_errors=True)

    def try_resume(self, opt_state=None):
        """Resume params (+ optimizer state and step) from the latest
        checkpoint-* (reference train.py:990-993 auto-resume)."""
        ckpt = _latest_checkpoint(self.rcfg.output_dir)
        if ckpt is None or self.tcfg.stage == "pretrain":
            return 0, opt_state
        state_dir = os.path.abspath(os.path.join(ckpt, "state"))
        if os.path.isdir(state_dir):
            target = {"params": jax.device_get(self.params), "step": 0}
            if opt_state is not None:
                target["opt_state"] = jax.device_get(opt_state)
            restored = self.ckptr.restore(state_dir, target)
            self.params = restored["params"]
            step = restored.get("step") or int(
                re.search(r"checkpoint-(\d+)$", ckpt).group(1)
            )
            logger.info(f"resumed from {ckpt} at step {step}")
            return int(step), restored.get("opt_state", opt_state)
        return 0, opt_state

    def save_lora_checkpoint(self, step: int, lora, lcfg):
        """Reference LoRA layout (train.py:998-1008): adapter_model.bin +
        adapter_config.json + non_lora_trainables.bin — loadable by
        api.load_pretrained_model's LoRA branch."""
        import json

        from tokenpacker_tpu.io.hf_import import export_tokenpacker
        from tokenpacker_tpu.train.lora import export_lora_state_dict

        out = os.path.join(self.rcfg.output_dir, f"checkpoint-{step}")
        os.makedirs(out, exist_ok=True)
        adapter_sd = export_lora_state_dict(jax.device_get(lora), lcfg)
        proj_sd = export_tokenpacker(jax.device_get(self.params["projector"]))
        nlt = {
            f"base_model.model.model.mm_projector.{k}": v for k, v in proj_sd.items()
        }
        with open(os.path.join(out, "adapter_config.json"), "w") as f:
            json.dump({"r": lcfg.r, "lora_alpha": lcfg.alpha,
                       "lora_dropout": lcfg.dropout, "peft_type": "LORA"}, f)
        try:
            import torch

            torch.save({k: torch.from_numpy(np.array(v)) for k, v in adapter_sd.items()},
                       os.path.join(out, "adapter_model.bin"))
            torch.save({k: torch.from_numpy(np.array(v)) for k, v in nlt.items()},
                       os.path.join(out, "non_lora_trainables.bin"))
        except ImportError:
            np.savez(os.path.join(out, "adapter_model.npz"), **adapter_sd)
            np.savez(os.path.join(out, "non_lora_trainables.npz"), **nlt)
        self._prune_checkpoints()
        logger.info(f"saved LoRA checkpoint-{step}")

    def _train_lora(self):
        """QLoRA loop: quantized (or dense) frozen base, trainable =
        (adapters, projector)."""
        import optax

        from tokenpacker_tpu.ops.quantize import quantize_tree, quantize_tree_4bit
        from tokenpacker_tpu.train.lora import init_lora, lora_train_step_factory

        rcfg, tcfg = self.rcfg, self.tcfg
        lcfg = rcfg.lora
        n_batches = len(self.dataset) // (rcfg.per_device_batch_size * self.mesh.shape["data"])
        total_steps = max(n_batches * rcfg.num_train_epochs, 1)
        tcfg = dataclasses.replace(tcfg, total_steps=total_steps)

        base = dict(self.params)
        if rcfg.bits == 8:
            base["lm"] = quantize_tree(base["lm"])
        elif rcfg.bits == 4:
            base["lm"] = quantize_tree_4bit(base["lm"])
        self.params = base
        lora = init_lora(jax.random.PRNGKey(rcfg.seed), base, lcfg)
        trainable = (lora, base["projector"])
        warmup = max(min(int(tcfg.warmup_ratio * total_steps), total_steps - 1), 0)
        if total_steps > 1:
            lr = optax.warmup_cosine_decay_schedule(
                0.0, tcfg.learning_rate, max(warmup, 1) if warmup else 1,
                total_steps + 1,
            )
        else:
            lr = tcfg.learning_rate
        tx = optax.chain(optax.clip_by_global_norm(tcfg.max_grad_norm), optax.adamw(lr))
        opt_state = tx.init(trainable)
        step_fn = lora_train_step_factory(self.cfg, lcfg, tx)

        step = 0
        t0 = time.time()
        for epoch in range(rcfg.num_train_epochs):
            for batch in self._batches():
                batch.pop("mode", None)
                batch.pop("attn_mask", None)
                batch.pop("lengths", None)
                trainable, opt_state, metrics = step_fn(trainable, base, opt_state, batch)
                step += 1
                if step % rcfg.logging_steps == 0:
                    logger.info(
                        f"step {step}/{total_steps} loss {float(metrics['loss']):.4f} "
                        f"({(time.time() - t0) / max(step, 1):.2f}s/step)"
                    )
                if step % rcfg.save_steps == 0:
                    self.params = {**self.params, "projector": trainable[1]}
                    self.save_lora_checkpoint(step, trainable[0], lcfg)
        self.params = {**self.params, "projector": trainable[1]}
        self.save_lora_checkpoint(step, trainable[0], lcfg)
        return trainable

    # -- main loop ---------------------------------------------------------

    def train(self):
        if self.rcfg.lora is not None:
            return self._train_lora()
        rcfg, tcfg = self.rcfg, self.tcfg
        n_batches = len(self.dataset) // (
            rcfg.per_device_batch_size * self.mesh.shape["data"]
        )
        total_steps = max(n_batches * rcfg.num_train_epochs, 1)
        # with gradient accumulation the LR schedule advances once per
        # OPTIMIZER step (MultiSteps applies the inner transform every k
        # micro-steps), so the schedule length is micro-steps / k
        accum = max(tcfg.gradient_accumulation_steps, 1)
        tcfg = dataclasses.replace(tcfg, total_steps=max(total_steps // accum, 1))

        with jax.set_mesh(self.mesh):
            self.params = shard_params(self.params, self.mesh)
            tx = make_optimizer(tcfg, self.params)
            opt_state = tx.init(self.params)
            step_fn = make_train_step(self.cfg, tx)

            start_step, opt_state = self.try_resume(opt_state)
            step = start_step
            t0 = time.time()
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_sh = NamedSharding(self.mesh, P("data"))
            for epoch in range(rcfg.num_train_epochs):
                for batch in self._batches():
                    batch.pop("mode", None)
                    batch.pop("attn_mask", None)
                    batch.pop("lengths", None)
                    dev_batch = {
                        k: (jax.device_put(v, data_sh) if v is not None else None)
                        for k, v in batch.items()
                    }
                    self.params, opt_state, metrics = step_fn(self.params, opt_state, dev_batch)
                    step += 1
                    if step % rcfg.logging_steps == 0:
                        loss = float(metrics["loss"])
                        dt = time.time() - t0
                        logger.info(
                            f"step {step}/{total_steps} loss {loss:.4f} "
                            f"({dt / max(step - start_step, 1):.2f}s/step)"
                        )
                    if step % rcfg.save_steps == 0:
                        self.save_checkpoint(step, opt_state)
            self.save_checkpoint(step, opt_state)
            self.finish_pending_saves()
        return self.params
