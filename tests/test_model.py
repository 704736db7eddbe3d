"""Model-level parity: our Flax OSVOS vs an independent torch restatement of
the reference architecture, with identical weights (SURVEY.md §4b golden
test, random-weight variant — no pretrained weights are fetchable offline)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from osvos_tpu.configs import ModelConfig
from osvos_tpu.models import OSVOS, init_osvos_params, load_torch_state_dict
from osvos_tpu.models.vgg_osvos import stage_conv_names

from tests.torch_oracle import TorchOSVOS


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(7)
    net = TorchOSVOS()
    net.eval()
    return net


@pytest.fixture(scope="module")
def ported_params(torch_net):
    state = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
    return load_torch_state_dict(state)


def test_port_roundtrip_covers_all_params(ported_params):
    names = {n for n, _, _ in stage_conv_names()}
    names |= {f"side_prep{i}" for i in range(1, 5)}
    names |= {f"score_dsn{i}" for i in range(1, 5)}
    names |= {"fuse"}
    assert set(ported_params.keys()) == names


@pytest.mark.parametrize("hw", [(65, 97), (64, 96)])
def test_forward_parity_random_weights(torch_net, ported_params, rng, hw):
    h, w = hw
    x = (rng.randn(1, h, w, 3) * 40).astype(np.float32)
    with torch.no_grad():
        torch_out = torch_net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    model = OSVOS(ModelConfig(compute_mode="parity"))
    jax_out = jax.jit(lambda p, v: model.apply({"params": p}, v))(
        ported_params, jnp.asarray(x))
    assert len(jax_out) == len(torch_out) == 5
    for i, (jo, to) in enumerate(zip(jax_out, torch_out)):
        to = np.transpose(to.numpy(), (0, 2, 3, 1))
        assert jo.shape == to.shape == (1, h, w, 1), i
        scale = max(np.abs(to).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(jo), to, atol=2e-4 * scale,
                                   err_msg=f"output {i}")


def test_forward_parity_vs_float64_oracle(torch_net, rng):
    """Parity mode vs the torch oracle run in float64: isolates OUR error
    from torch's own f32 accumulation error. The f32-vs-f32 test above needs
    atol 2e-4*scale; against the float64-exact answer the parity path holds
    1e-5*scale (measured ~1.3e-6), i.e. it sits at f32 round-off."""
    net64 = torch_net.double()
    state = {k: v.detach().float().numpy()
             for k, v in net64.state_dict().items()}
    params = load_torch_state_dict(state)
    x = (rng.randn(1, 65, 97, 3) * 40).astype(np.float32)
    with torch.no_grad():
        torch_out = net64(torch.from_numpy(
            np.transpose(x.astype(np.float64), (0, 3, 1, 2))))
    model = OSVOS(ModelConfig(compute_mode="parity"))
    jax_out = jax.jit(lambda p, v: model.apply({"params": p}, v))(
        params, jnp.asarray(x))
    torch_net.float()  # restore for other tests sharing the fixture
    for i, (jo, to) in enumerate(zip(jax_out, torch_out)):
        to = np.transpose(to.numpy(), (0, 2, 3, 1))
        scale = max(np.abs(to).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(jo, np.float64), to,
                                   atol=1e-5 * scale, err_msg=f"output {i}")


@pytest.mark.slow
def test_output_shapes_davis_like():
    # Full odd-shape chain (480p DAVIS) — shapes only, tiny channel config
    # to keep CPU time sane.
    cfg = ModelConfig(stages=((4, 4), (6, 6), (8, 8, 8), (8, 8, 8), (8, 8, 8)),
                      side_channels=4)
    model = OSVOS(cfg)
    x = jnp.zeros((1, 480, 854, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    for o in outs:
        assert o.shape == (1, 480, 854, 1)


@pytest.mark.slow
def test_init_matches_reference_distribution():
    params = init_osvos_params(jax.random.PRNGKey(0))
    k = np.asarray(params["side_prep1"]["kernel"])
    assert abs(float(k.std()) - 0.001) < 3e-4
    assert float(np.abs(np.asarray(params["fuse"]["bias"])).max()) == 0.0


def test_fast_mode_close_to_parity(ported_params, rng):
    x = (rng.randn(1, 33, 49, 3) * 20).astype(np.float32)
    parity = OSVOS(ModelConfig(compute_mode="parity"))
    fast = OSVOS(ModelConfig(compute_mode="fast"))
    o1 = parity.apply({"params": ported_params}, jnp.asarray(x))[-1]
    o2 = fast.apply({"params": ported_params}, jnp.asarray(x))[-1]
    assert o2.dtype == jnp.float32
    # bf16 trunk: expect coarse but correlated agreement
    denom = float(np.abs(np.asarray(o1)).max()) + 1e-6
    rel = float(np.abs(np.asarray(o1) - np.asarray(o2)).max()) / denom
    assert rel < 0.15, rel


@pytest.mark.parametrize("hw", [(65, 97), (64, 96)])
def test_infer_mode_matches_train_fused_output(ported_params, rng, hw):
    """mode='infer' (fused head: per-branch 1x1 before upsample) must equal
    the reference-ordered train-mode fused logits to f32 round-off."""
    h, w = hw
    x = (rng.randn(1, h, w, 3) * 40).astype(np.float32)
    model = OSVOS(ModelConfig(compute_mode="parity"))
    train_out = model.apply({"params": ported_params}, jnp.asarray(x))[-1]
    infer_out = model.apply({"params": ported_params}, jnp.asarray(x),
                            mode="infer")
    assert len(infer_out) == 1
    scale = float(np.abs(np.asarray(train_out)).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(infer_out[0]),
                               np.asarray(train_out), atol=2e-4 * scale)


@pytest.mark.slow
def test_int8_mode_close_to_parity(ported_params, rng):
    """int8 trunk inference: same params, bounded deviation from the f32
    fused output and >=99% mask-pixel agreement at the 0.5 threshold."""
    x = (rng.randn(1, 33, 49, 3) * 20).astype(np.float32)
    parity = OSVOS(ModelConfig(compute_mode="parity"))
    int8 = OSVOS(ModelConfig(compute_mode="int8"))
    o1 = np.asarray(parity.apply({"params": ported_params},
                                 jnp.asarray(x))[-1])
    o8 = np.asarray(int8.apply({"params": ported_params}, jnp.asarray(x),
                               mode="infer")[-1])
    denom = float(np.abs(o1).max()) + 1e-6
    rel = float(np.abs(o1 - o8).max()) / denom
    assert rel < 0.35, rel  # logit deviation bounded
    agree = np.mean((o1 > 0) == (o8 > 0))
    assert agree >= 0.99, agree


@pytest.mark.slow
def test_int8_static_scales_close_to_dynamic(ported_params, rng):
    """Calibrated static scales must track dynamic-max quantization."""
    import dataclasses

    from osvos_tpu.models.quantize import calibrate_int8_scales

    x = (rng.randn(2, 33, 49, 3) * 20).astype(np.float32)
    scales = calibrate_int8_scales(ported_params, jnp.asarray(x))
    assert len(scales) == 13 and all(s > 0 for s in scales)

    dyn = OSVOS(ModelConfig(compute_mode="int8"))
    sta = OSVOS(dataclasses.replace(ModelConfig(compute_mode="int8"),
                                    int8_scales=scales))
    o_d = np.asarray(dyn.apply({"params": ported_params}, jnp.asarray(x),
                               mode="infer")[-1])
    o_s = np.asarray(sta.apply({"params": ported_params}, jnp.asarray(x),
                               mode="infer")[-1])
    denom = float(np.abs(o_d).max()) + 1e-6
    assert float(np.abs(o_d - o_s).max()) / denom < 0.2


@pytest.mark.slow
def test_int8_agreement_after_fine_tuning(rng):
    """int8 inference must track the f32 path on a model that actually
    learned something (fine-tuned on a synthetic pair), not just at random
    init — the regime the quantized deploy path runs in."""
    from osvos_tpu.configs import OnlineConfig
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.train.online import make_fine_tune_fn

    TINY = ModelConfig(stages=((4, 4), (6, 6), (8, 8, 8), (8, 8, 8),
                               (8, 8, 8)), side_channels=4,
                       compute_mode="parity")
    params = init_osvos_params(jax.random.PRNGKey(0), TINY, input_hw=(32, 48))
    yy, xx = np.mgrid[0:32, 0:48].astype(np.float32)
    img = np.stack([np.sin(xx / 5), np.cos(yy / 4), xx / 48], -1) * 60
    mask = ((((yy - 16) / 8) ** 2 + ((xx - 20) / 10) ** 2) <= 1
            ).astype(np.float32)[..., None]
    img += np.where(mask > 0, 80.0, 0.0)

    cfg = OnlineConfig(n_steps=30, n_ave_grad=2, lr=1e-4, hflip_prob=0.0)
    ft = jax.jit(make_fine_tune_fn(TINY, cfg, aug_mode="pool", pool_size=2))
    tuned, losses = ft(params, jnp.asarray(img), jnp.asarray(mask),
                       jax.random.PRNGKey(1))
    assert float(losses[-1]) < float(losses[0])  # it learned

    x = jnp.asarray(img[None])
    f32 = OSVOS(TINY).apply({"params": tuned}, x, mode="infer")[-1]
    int8 = OSVOS(ModelConfig(stages=TINY.stages, side_channels=4,
                             compute_mode="int8")).apply(
        {"params": tuned}, x, mode="infer")[-1]
    agree = np.mean((np.asarray(f32) > 0) == (np.asarray(int8) > 0))
    assert agree >= 0.99, agree
