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


def torch_reference_greedy_hd(tower, projector, lm, ids, crops, hb, wb,
                              sep_id, ret_id, n_steps, multi_layers,
                              eos_id=2, on_step=None):
    """Reference HD slice chain (llava_arch.py:115-154 + patch_divide): all
    crops (row-major sub-patches then the global view) through the tower +
    TokenPacker in one batch; splice = per-row crops joined by the `,` embed,
    `\\n` embed after each row, then the global view + `\\n`; greedy loop
    with full recompute."""
    with torch.no_grad():
        out = tower(crops, output_hidden_states=True)
        feats = out.hidden_states[-2][:, 1:]
        multi = torch.cat([out.hidden_states[l] for l in multi_layers], dim=2)[:, 1:]
        visual = projector((feats, multi))  # [n_crops, tpv, D]

        embed = lm.get_input_embeddings()
        sep = embed(torch.tensor([sep_id]))
        ret = embed(torch.tensor([ret_id]))
        parts = []
        idx = 0
        for i in range(hb):
            for j in range(wb):
                parts.append(visual[idx])
                idx += 1
                if j < wb - 1:
                    parts.append(sep)
            parts.append(ret)
        if hb * wb > 1:
            parts.append(visual[idx])  # global view last
            parts.append(ret)
        block = torch.cat(parts, dim=0)

        generated = list(ids)
        for step in range(n_steps):
            cur = torch.tensor(generated)
            img_pos = int((cur == IMAGE_TOKEN_INDEX).nonzero()[0])
            emb_tok = embed(torch.clamp(cur, min=0))
            emb = torch.cat([emb_tok[:img_pos], block, emb_tok[img_pos + 1 :]], dim=0)[None]
            logits = lm(inputs_embeds=emb).logits[0, -1]
            nxt = int(torch.argmax(logits))
            if on_step is not None:
                on_step(step, nxt)
            generated.append(nxt)
            if nxt == eos_id:
                break
        return generated[len(ids):]
