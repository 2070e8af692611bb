"""Numerical parity of the TokenPacker projector vs a torch oracle.

The oracle implements the reference math (SURVEY.md §2.1 "TokenPacker math";
reference llava/model/multimodal_projector/builder.py:107-137) directly from
torch primitives — nn.MultiheadAttention, F.interpolate — so it exercises the
exact operator semantics (packed QKV, align_corners=False bilinear) that our
JAX reformulation must reproduce.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from tokenpacker_tpu.config import ProjectorConfig
from tokenpacker_tpu.models.tokenpacker import tokenpacker_forward
from tokenpacker_tpu.ops.layers import bilinear_resize_matrix


class TorchOracle(nn.Module):
    """Reference-spec TokenPacker in torch (independent implementation)."""

    def __init__(self, cfg: ProjectorConfig):
        super().__init__()
        e = cfg.embed_dim
        self.cfg = cfg
        self.q_proj = nn.Linear(cfg.kv_dim, e, bias=False)
        self.k_proj = nn.Sequential(
            nn.Linear(cfg.kv_input_dim, e), nn.GELU(), nn.Linear(e, e)
        )
        self.v_proj = nn.Sequential(
            nn.Linear(cfg.kv_input_dim, e), nn.GELU(), nn.Linear(e, e)
        )
        self.ln_q = nn.LayerNorm(e, eps=cfg.ln_eps)
        self.ln_k = nn.LayerNorm(e, eps=cfg.ln_eps)
        self.ln_v = nn.LayerNorm(e, eps=cfg.ln_eps)
        self.attn = nn.MultiheadAttention(e, cfg.num_heads)
        self.mlp = nn.Sequential(
            nn.Linear(e, cfg.hidden_size),
            nn.GELU(),
            nn.Linear(cfg.hidden_size, cfg.hidden_size),
        )

    def _region_index(self):
        """flat indices of each region's s*s fine tokens, [G, s*s]."""
        cfg = self.cfg
        s, g = cfg.scale_factor, cfg.grid_size
        idx = []
        for i in range(g):
            for j in range(g):
                cell = []
                for di in range(s):
                    for dj in range(s):
                        cell.append((i * s + di) * cfg.raw_grid + (j * s + dj))
                idx.append(cell)
        return torch.tensor(idx)

    def forward(self, x, x_multi):
        cfg = self.cfg
        n = x.shape[0]
        g = cfg.grid_size
        key = self.ln_k(self.k_proj(x_multi))  # [N, T, E]
        value = self.ln_v(self.v_proj(x_multi))

        q = x.reshape(n, cfg.raw_grid, cfg.raw_grid, -1).float().permute(0, 3, 1, 2)
        q = F.interpolate(q, size=(g, g), mode="bilinear", align_corners=False)
        q = q.permute(0, 2, 3, 1).reshape(n, g * g, -1).to(x.dtype)
        query = self.ln_q(self.q_proj(q))  # [N, G, E]

        idx = self._region_index()  # [G, s*s]
        outs = []
        for r in range(g * g):
            qr = query[:, r : r + 1].permute(1, 0, 2)  # [1, N, E]
            kr = key[:, idx[r]].permute(1, 0, 2)  # [s*s, N, E]
            vr = value[:, idx[r]].permute(1, 0, 2)
            o, _ = self.attn(qr, kr, vr)
            outs.append(o[0])  # [N, E]
        out = torch.stack(outs, dim=1)  # [N, G, E]
        return self.mlp(out)


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def params_from_oracle(m: TorchOracle):
    e = m.cfg.embed_dim
    w = m.attn.in_proj_weight.detach()
    b = m.attn.in_proj_bias.detach()
    return {
        "q_proj": {"kernel": _t2j(m.q_proj.weight.T), "bias": None},
        "k_proj": {
            "fc1": {"kernel": _t2j(m.k_proj[0].weight.T), "bias": _t2j(m.k_proj[0].bias)},
            "fc2": {"kernel": _t2j(m.k_proj[2].weight.T), "bias": _t2j(m.k_proj[2].bias)},
        },
        "v_proj": {
            "fc1": {"kernel": _t2j(m.v_proj[0].weight.T), "bias": _t2j(m.v_proj[0].bias)},
            "fc2": {"kernel": _t2j(m.v_proj[2].weight.T), "bias": _t2j(m.v_proj[2].bias)},
        },
        "ln_q": {"scale": _t2j(m.ln_q.weight), "bias": _t2j(m.ln_q.bias)},
        "ln_k": {"scale": _t2j(m.ln_k.weight), "bias": _t2j(m.ln_k.bias)},
        "ln_v": {"scale": _t2j(m.ln_v.weight), "bias": _t2j(m.ln_v.bias)},
        "attn": {
            "q": {"kernel": _t2j(w[:e].T), "bias": _t2j(b[:e])},
            "k": {"kernel": _t2j(w[e : 2 * e].T), "bias": _t2j(b[e : 2 * e])},
            "v": {"kernel": _t2j(w[2 * e :].T), "bias": _t2j(b[2 * e :])},
            "o": {
                "kernel": _t2j(m.attn.out_proj.weight.T),
                "bias": _t2j(m.attn.out_proj.bias),
            },
        },
        "mlp": {
            "fc1": {"kernel": _t2j(m.mlp[0].weight.T), "bias": _t2j(m.mlp[0].bias)},
            "fc2": {"kernel": _t2j(m.mlp[2].weight.T), "bias": _t2j(m.mlp[2].bias)},
        },
    }


@pytest.mark.parametrize("scale_factor", [2, 3, 4])
def test_tokenpacker_parity_tiny(scale_factor):
    torch.manual_seed(0)
    cfg = ProjectorConfig(
        raw_grid=12,
        embed_dim=32,
        num_heads=4,
        kv_dim=32,
        kv_input_dim=128,
        hidden_size=48,
        scale_factor=scale_factor,
    )
    oracle = TorchOracle(cfg).eval()
    n, t = 3, cfg.raw_grid**2
    x = torch.randn(n, t, cfg.kv_dim)
    x_multi = torch.randn(n, t, cfg.kv_input_dim)
    with torch.no_grad():
        ref = oracle(x, x_multi).numpy()

    params = params_from_oracle(oracle)
    got = tokenpacker_forward(params, cfg, _t2j(x), _t2j(x_multi))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)
    assert got.shape == (n, cfg.num_queries, cfg.hidden_size)


def test_tokenpacker_parity_full_size():
    """Production geometry: 576 tokens, 1024-dim, 4096 kv-in, s=2 → 144 tokens."""
    torch.manual_seed(1)
    cfg = ProjectorConfig()  # defaults = reference defaults
    oracle = TorchOracle(cfg).eval()
    n = 2
    x = torch.randn(n, 576, 1024)
    x_multi = torch.randn(n, 576, 4096)
    with torch.no_grad():
        ref = oracle(x, x_multi).numpy()
    got = tokenpacker_forward(params_from_oracle(oracle), cfg, _t2j(x), _t2j(x_multi))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-5, atol=5e-5)
    assert got.shape == (n, 144, 4096)


@pytest.mark.parametrize("src,dst", [(24, 12), (24, 8), (24, 6), (12, 4), (7, 3)])
def test_bilinear_matrix_matches_torch_interpolate(src, dst):
    torch.manual_seed(2)
    x = torch.randn(1, 5, src, src)
    ref = F.interpolate(x, size=(dst, dst), mode="bilinear", align_corners=False)
    w = bilinear_resize_matrix(src, dst)
    got = np.einsum("oh,pw,nchw->ncop", w, w, x.numpy())
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-5, atol=1e-5)
