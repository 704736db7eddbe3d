"""utils: visualization + logging + torch_port round trips."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from osvos_tpu.configs import ModelConfig
from osvos_tpu.models import OSVOS, init_osvos_params

TINY = ModelConfig(stages=((4, 4), (6, 6), (8, 8, 8), (8, 8, 8), (8, 8, 8)),
                   side_channels=4)


def test_make_dot_and_summary(tmp_path):
    from osvos_tpu.utils.visualize import make_dot, model_summary, save_dot

    model = OSVOS(TINY)
    p = init_osvos_params(jax.random.PRNGKey(0), TINY, input_hw=(32, 48))
    dot = make_dot(lambda pp, v: model.apply({"params": pp}, v), p,
                   jnp.zeros((1, 32, 48, 3)))
    assert dot.startswith("digraph") and "conv" in dot
    out = save_dot(dot, str(tmp_path / "net.dot"), render=None)
    assert os.path.exists(out)
    s = model_summary(model, jnp.zeros((1, 32, 48, 3)))
    assert "stage1_conv0" in s and "fuse" in s


def test_scalar_logger_jsonl(tmp_path):
    import json

    from osvos_tpu.utils.logging import ScalarLogger

    lg = ScalarLogger(str(tmp_path), use_tensorboard=False)
    lg.add_scalar("total_loss_epoch", 1.5, 3)
    lg.close()
    rec = json.loads(open(lg.jsonl_path).readline())
    assert rec["tag"] == "total_loss_epoch" and rec["step"] == 3


def test_torch_port_npz_roundtrip(tmp_path):
    from osvos_tpu.utils.torch_port import load_pth_as_numpy, save_numpy_state

    state = {"a.weight": np.ones((2, 3), np.float32),
             "b.bias": np.zeros((4,), np.float32)}
    path = str(tmp_path / "s.npz")
    save_numpy_state(state, path)
    back = load_pth_as_numpy(path)
    assert set(back) == set(state)
    np.testing.assert_array_equal(back["a.weight"], state["a.weight"])
