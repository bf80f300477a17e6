"""Plain-torch oracle for the "small" DSPointConv family.

Re-executes the reference's depthwise-separable point conv and
guide-CRF decoder semantics (models/point_conv.py:13-66,
models/continuous_crf_conv.py:9-69) on DENSE padded indices (the same
protocol our models consume), with no torch_geometric dependencies.
Used by tests/test_parity_small.py with weights copied from the flax
modules.  Test infrastructure only.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_ref import gather_neighbors  # same dense gather helper


class TorchMLP001(nn.Module):
    """Linear (bias iff no BN) -> BN over flattened points -> LeakyReLU(0.01)."""

    def __init__(self, cin, cout, bn=True, act=True):
        super().__init__()
        self.lin = nn.Linear(cin, cout, bias=not bn)
        self.bn = nn.BatchNorm1d(cout) if bn else None
        self.act = act

    def forward(self, x):
        shape = x.shape
        x = self.lin(x.reshape(-1, shape[-1]))
        if self.bn is not None:
            x = self.bn(x)
        if self.act:
            x = F.leaky_relu(x, negative_slope=0.01)
        return x.reshape(*shape[:-1], -1)


class TorchDSPointConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        hidden = cout // 4
        self.mlp1_0 = TorchMLP001(3, hidden)
        self.mlp1_1 = TorchMLP001(hidden, hidden, act=False)
        self.mlp2 = TorchMLP001(cin, hidden)
        self.mlp3 = TorchMLP001(hidden, cout, act=False)
        self.mlp4 = TorchMLP001(cin, cout, act=False) if cin != cout else None

    def forward(self, x, pos, idx, sub_pos=None):
        h = self.mlp2(x)
        hn = gather_neighbors(h, idx)
        if sub_pos is None:
            residual = x
        else:
            residual = gather_neighbors(x, idx).max(dim=2)[0]
        if self.mlp4 is not None:
            residual = self.mlp4(residual)
        neighbors = gather_neighbors(pos, idx)
        center = pos if sub_pos is None else sub_pos
        rel = center.unsqueeze(2) - neighbors
        w = self.mlp1_1(self.mlp1_0(rel))
        h = (w * hn).sum(dim=2)
        h = self.mlp3(h)
        return F.leaky_relu(h + residual, negative_slope=0.01)


class TorchGuideCRF(nn.Module):
    """GuideGaussianCRFConv on dense kNN (self-loop dropped), no radius mask."""

    def __init__(self, c_x, c_y, cout, steps=1):
        super().__init__()
        self.unary = TorchMLP001(c_x, cout, act=False)
        self.pairwise = TorchMLP001(c_y, cout, act=True)
        self.c = nn.Parameter(torch.eye(cout))
        self.cout = cout
        self.steps = steps

    def forward(self, x, y, idx):
        nidx = idx[:, :, 1:]
        xh = self.unary(x)
        yh = self.pairwise(y)
        yn = gather_neighbors(yh, nidx)
        s = (yh.unsqueeze(2) - yn).pow(2).sum(-1, keepdim=True)
        s = (-s).softmax(dim=2)
        z = xh
        C = self.c.t().mm(self.c)
        inv = (torch.eye(self.cout) + C).inverse()
        h = z
        for _ in range(self.steps):
            hn = gather_neighbors(h, nidx)
            h = (s * hn).sum(dim=2)
            h = z + h.matmul(C)
            h = h.matmul(inv)
        return F.leaky_relu(h, negative_slope=0.01)


class TorchDiscreteCRF(nn.Module):
    """Discrete CRF mean field on dense kNN with a radius mask
    (models/discrete_crf_conv.py:40-63 semantics)."""

    def __init__(self, n_classes, d_feat, hidden=64, num_kernels=5,
                 radius=0.2, steps=5):
        super().__init__()
        self.F = nn.Parameter(torch.rand(num_kernels, d_feat, hidden))
        self.W = nn.Parameter(torch.full((num_kernels, 1), 1.0 / num_kernels))
        self.C = nn.Parameter(torch.eye(n_classes))
        self.radius = radius
        self.steps = steps

    def forward(self, pos, p, f, idx):
        nidx = idx[:, :, 1:]
        u = -torch.log(p.clamp_min(1e-12))
        emb = torch.einsum("bnd,kdh->bnkh", f, self.F)       # [B,N,Kk,H]
        B, N = emb.shape[0], emb.shape[1]
        emb_flat = emb.reshape(B, N, -1)
        emb_n = gather_neighbors(emb_flat, nidx).reshape(
            B, N, nidx.shape[-1], *emb.shape[2:]
        )
        diff = emb.unsqueeze(2) - emb_n                      # [B,N,Kn,Kk,H]
        w = torch.exp(-(diff ** 2).sum(-1))                  # [B,N,Kn,Kk]
        w = (w @ self.W).squeeze(-1)                         # [B,N,Kn]
        npos = gather_neighbors(pos, nidx)
        d2 = ((pos.unsqueeze(2) - npos) ** 2).sum(-1)
        w = torch.where(d2 <= self.radius ** 2, w, torch.zeros_like(w))
        q = p
        for _ in range(self.steps):
            qn = gather_neighbors(q, nidx)
            msg = torch.einsum("bnk,bnkl->bnl", w, qn)
            q = torch.softmax(-u - msg.matmul(self.C), dim=-1)
        return q


def copy_mlp(t: TorchMLP001, fp: dict):
    t.lin.weight.data = torch.from_numpy(
        np.asarray(fp["Dense_0"]["kernel"]).T.copy()
    )
    if "bias" in fp["Dense_0"]:
        t.lin.bias.data = torch.from_numpy(
            np.asarray(fp["Dense_0"]["bias"]).copy()
        )
    if t.bn is not None:
        bn = fp["MaskedBatchNorm_0"]
        t.bn.weight.data = torch.from_numpy(np.asarray(bn["scale"]).copy())
        t.bn.bias.data = torch.from_numpy(np.asarray(bn["bias"]).copy())


def copy_ds(t: TorchDSPointConv, fp: dict):
    copy_mlp(t.mlp1_0, fp["mlp1_0"])
    copy_mlp(t.mlp1_1, fp["mlp1_1"])
    copy_mlp(t.mlp2, fp["mlp2"])
    copy_mlp(t.mlp3, fp["mlp3"])
    if t.mlp4 is not None:
        copy_mlp(t.mlp4, fp["mlp4"])


def copy_guide_crf(t: TorchGuideCRF, fp: dict):
    copy_mlp(t.unary, fp["unary"])
    copy_mlp(t.pairwise, fp["pairwise"])
    t.c.data = torch.from_numpy(np.asarray(fp["c"]).copy())
