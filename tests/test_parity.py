"""Whole-model golden parity: flax PointConvResNet vs the plain-torch
oracle re-executing the reference semantics, with identical weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from crfconv_tpu.data.pipeline import synthetic_batch
from crfconv_tpu.models import PointConvResNet
from tests.torch_ref import TorchPointConvResNet, load_from_flax

B, N, C_IN, N_CLASSES = 2, 256, 6, 8


@pytest.mark.parametrize("use_crf,steps", [(True, 2), (False, 0)])
def test_flagship_model_parity(use_crf, steps):
    batch = synthetic_batch(B, N, C_IN, N_CLASSES, seed=5)
    model = PointConvResNet(n_classes=N_CLASSES, use_crf=use_crf, steps=steps)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    ours = np.asarray(model.apply(variables, batch, train=False))

    tmodel = TorchPointConvResNet(
        C_IN, N_CLASSES, use_crf=use_crf, steps=max(steps, 1) if use_crf else 1
    )
    if use_crf:
        # mirror steps exactly
        for d in [tmodel.deconv4, tmodel.deconv3, tmodel.deconv2, tmodel.deconv1]:
            d.steps = steps
    load_from_flax(tmodel, variables["params"], use_crf=use_crf)
    tmodel.eval()

    scales = [
        {
            "pos": torch.from_numpy(np.asarray(s.pos)),
            "neighbor_idx": torch.from_numpy(np.asarray(s.neighbor_idx)).long(),
            "sub_idx": torch.from_numpy(np.asarray(s.sub_idx)).long(),
            "up_idx": torch.from_numpy(np.asarray(s.up_idx)).long(),
        }
        for s in batch.scales
    ]
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(np.asarray(batch.x)), scales).numpy()

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
