"""Shared torch reference-chain oracles (used by the in-suite parity tests
AND scripts/full_size_layout_check.py so the two cannot drift)."""

import torch

from tokenpacker_tpu.constants import IMAGE_TOKEN_INDEX


def torch_reference_greedy(tower, projector, lm, ids, image, n_steps,
                           multi_layers, eos_id=2, on_step=None):
    """Reference chain: CLIPVisionTower.feature_select semantics
    (clip_encoder.py:47-62) → reference TokenPacker.forward((x, x_multi)) →
    splice at IMAGE_TOKEN_INDEX → greedy loop with full recompute."""
    with torch.no_grad():
        out = tower(image, output_hidden_states=True)
        feats = out.hidden_states[-2][:, 1:]
        multi = torch.cat([out.hidden_states[l] for l in multi_layers], dim=2)[:, 1:]
        visual = projector((feats, multi))[0]  # [tpv, D]

        generated = list(ids)
        for step in range(n_steps):
            cur = torch.tensor(generated)
            img_pos = int((cur == IMAGE_TOKEN_INDEX).nonzero()[0])
            emb_tok = lm.get_input_embeddings()(torch.clamp(cur, min=0))
            emb = torch.cat([emb_tok[:img_pos], visual, emb_tok[img_pos + 1 :]], dim=0)[None]
            logits = lm(inputs_embeds=emb).logits[0, -1]
            nxt = int(torch.argmax(logits))
            if on_step is not None:
                on_step(step, nxt)
            generated.append(nxt)
            if nxt == eos_id:
                break
        return generated[len(ids):]
