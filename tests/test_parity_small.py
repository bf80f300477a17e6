"""Golden parity for the small family's building blocks: flax
DSPointConv / GuideCRFConv vs plain-torch re-executions of the reference
semantics with identical weights."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from crfconv_tpu.models.crf_conv import GuideCRFConv
from crfconv_tpu.models.discrete_crf import DiscreteCRFConv
from crfconv_tpu.models.point_conv_small import DSPointConv
from tests.torch_ref_small import (
    TorchDiscreteCRF,
    TorchDSPointConv,
    TorchGuideCRF,
    copy_ds,
    copy_guide_crf,
)

RNG = np.random.RandomState(11)
B, N, K = 2, 128, 8


def _idx(m, n):
    idx = RNG.randint(0, n, size=(B, m, K)).astype(np.int32)
    idx[:, :, 0] = np.arange(m) % n  # col0 "self"-ish for CRF removal
    return idx


class TestDSPointConvParity:
    def test_symmetric(self):
        x = RNG.randn(B, N, 6).astype(np.float32)
        pos = RNG.randn(B, N, 3).astype(np.float32)
        idx = _idx(N, N)
        m = DSPointConv(32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pos),
                   jnp.asarray(idx), train=False)
        ours = np.asarray(
            m.apply(v, jnp.asarray(x), jnp.asarray(pos), jnp.asarray(idx),
                    train=False)
        )
        t = TorchDSPointConv(6, 32)
        copy_ds(t, v["params"])
        t.eval()
        with torch.no_grad():
            ref = t(
                torch.from_numpy(x), torch.from_numpy(pos),
                torch.from_numpy(idx).long(),
            ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_strided(self):
        S = N // 4
        x = RNG.randn(B, N, 32).astype(np.float32)
        pos = RNG.randn(B, N, 3).astype(np.float32)
        sub_pos = pos[:, :S]
        idx = _idx(S, N)
        m = DSPointConv(64)
        args = (jnp.asarray(x), jnp.asarray(pos), jnp.asarray(idx))
        v = m.init(jax.random.PRNGKey(1), *args,
                   sub_pos=jnp.asarray(sub_pos), train=False)
        ours = np.asarray(
            m.apply(v, *args, sub_pos=jnp.asarray(sub_pos), train=False)
        )
        t = TorchDSPointConv(32, 64)
        copy_ds(t, v["params"])
        t.eval()
        with torch.no_grad():
            ref = t(
                torch.from_numpy(x), torch.from_numpy(pos),
                torch.from_numpy(idx).long(),
                sub_pos=torch.from_numpy(np.ascontiguousarray(sub_pos)),
            ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestGuideCRFParity:
    def test_mean_field(self):
        x = RNG.randn(B, N, 64).astype(np.float32)
        y = RNG.randn(B, N, 32).astype(np.float32)
        pos = RNG.randn(B, N, 3).astype(np.float32)
        idx = _idx(N, N)
        m = GuideCRFConv(out_features=32, steps=3, radius=None)
        v = m.init(jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(y),
                   jnp.asarray(pos), jnp.asarray(idx), train=False)
        ours = np.asarray(
            m.apply(v, jnp.asarray(x), jnp.asarray(y), jnp.asarray(pos),
                    jnp.asarray(idx), train=False)
        )
        t = TorchGuideCRF(64, 32, 32, steps=3)
        copy_guide_crf(t, v["params"])
        t.eval()
        with torch.no_grad():
            ref = t(
                torch.from_numpy(x), torch.from_numpy(y),
                torch.from_numpy(idx).long(),
            ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


class TestDiscreteCRFParity:
    def test_mean_field(self):
        L, D = 6, 6
        pos = (RNG.rand(B, N, 3) * 0.4).astype(np.float32)  # dense: radius hits
        p = np.abs(RNG.randn(B, N, L)).astype(np.float32)
        p = p / p.sum(-1, keepdims=True)
        f = RNG.randn(B, N, D).astype(np.float32)
        idx = _idx(N, N)

        m = DiscreteCRFConv(n_classes=L, feat_features=D, steps=4)
        v = m.init(jax.random.PRNGKey(4), jnp.asarray(pos), jnp.asarray(p),
                   jnp.asarray(f), jnp.asarray(idx), train=False)
        ours = np.asarray(
            m.apply(v, jnp.asarray(pos), jnp.asarray(p), jnp.asarray(f),
                    jnp.asarray(idx), train=False)
        )
        t = TorchDiscreteCRF(L, D, steps=4)
        t.F.data = torch.from_numpy(np.asarray(v["params"]["F"]).copy())
        t.W.data = torch.from_numpy(np.asarray(v["params"]["W"]).copy())
        t.C.data = torch.from_numpy(np.asarray(v["params"]["C"]).copy())
        t.eval()
        with torch.no_grad():
            ref = t(
                torch.from_numpy(pos), torch.from_numpy(p),
                torch.from_numpy(f), torch.from_numpy(idx).long(),
            ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)
