"""Numeric parity of the Flax model vs the reference torch checkpoint.

The reference `.pth` provides golden tensors; the torch model (run, not
copied) is the oracle.  Tolerances are fp32 conv-accumulation level.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastdet.models import Detector
from tests.conftest import requires_reference


@pytest.fixture(scope="module")
def rand_input():
    rng = np.random.RandomState(0)
    return rng.rand(2, 3, 352, 352).astype(np.float32)


@requires_reference
def test_forward_parity(ref_variables, torch_model, torch_ref, rand_input):
    model = Detector(classes=80, anchor_num=3)
    outs = model.apply(ref_variables,
                       jnp.asarray(rand_input.transpose(0, 2, 3, 1)),
                       train=False)

    torch = torch_ref.torch
    with torch.no_grad():
        touts = torch_model(torch.from_numpy(rand_input))

    assert len(outs) == 6
    for i, (j, t) in enumerate(zip(outs, touts)):
        t_nhwc = t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(j), t_nhwc, atol=2e-4,
                                   err_msg=f"output {i}")


@requires_reference
def test_deploy_mode_parity(ref_variables, torch_ref, rand_input):
    """deploy=True bakes sigmoid/softmax/concat like export_onnx mode."""
    torch = torch_ref.torch
    tm = torch_ref.detector.Detector(80, 3, True, export_onnx=True)
    tm.load_state_dict(torch.load(
        "/root/reference/modelzoo/coco2017-0.241078ap-model.pth",
        map_location="cpu"))
    tm.eval()
    with torch.no_grad():
        t2, t3 = tm(torch.from_numpy(rand_input))

    model = Detector(classes=80, anchor_num=3)
    j2, j3 = model.apply(ref_variables,
                         jnp.asarray(rand_input.transpose(0, 2, 3, 1)),
                         train=False, deploy=True)
    # torch export path already permutes to NHWC
    np.testing.assert_allclose(np.asarray(j2), t2.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j3), t3.numpy(), atol=2e-4)


def test_param_count(ref_variables):
    """Reference checkpoint holds 251,664 floats incl. BN stats
    (SURVEY.md §6); our converted tree must match exactly (BN
    num_batches_tracked scalars excluded)."""
    import jax
    n = sum(int(np.prod(x.shape))
            for x in jax.tree.leaves(ref_variables))
    assert n == 251_664 - 73  # 73 num_batches_tracked scalars dropped


def test_output_shapes():
    """Random init forward produces the documented shapes."""
    import jax
    model = Detector(classes=80, anchor_num=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 352, 352, 3)), train=False)
    outs = model.apply(variables, jnp.zeros((1, 352, 352, 3)), train=False)
    shapes = [o.shape for o in outs]
    assert shapes == [(1, 22, 22, 12), (1, 22, 22, 3), (1, 22, 22, 80),
                      (1, 11, 11, 12), (1, 11, 11, 3), (1, 11, 11, 80)]
