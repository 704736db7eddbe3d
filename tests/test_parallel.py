"""Mesh/sharding tests on the 8-virtual-device CPU platform
(SURVEY.md §4d): batched online adaptation sharded over sequences, and the
data-parallel parent step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from osvos_tpu.configs import ModelConfig, OnlineConfig, ParentConfig
from osvos_tpu.models import init_osvos_params
from osvos_tpu.parallel.batched_online import (batched_fine_tune,
                                               batched_infer,
                                               stack_param_list,
                                               unstack_params)
from osvos_tpu.parallel.mesh import make_mesh
from osvos_tpu.train.online import make_fine_tune_fn
from osvos_tpu.train.parent import ParentTrainer

TINY = ModelConfig(stages=((4, 4), (6, 6), (8, 8, 8), (8, 8, 8), (8, 8, 8)),
                   side_channels=4, compute_mode="parity")


@pytest.fixture(scope="module")
def tiny_params():
    return init_osvos_params(jax.random.PRNGKey(0), TINY, input_hw=(32, 48))


def _pairs(rng, s, h=32, w=48):
    imgs, masks = [], []
    for i in range(s):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([np.sin(xx / (4 + i)), np.cos(yy / 5), xx / w], -1) * 50
        m = (((yy - h / 2) / (h / 4)) ** 2
             + ((xx - (w / 3 + 4 * i)) / (w / 5)) ** 2 <= 1).astype(np.float32)
        img += np.where(m[..., None] > 0, 70.0, 0.0)
        imgs.append(img.astype(np.float32))
        masks.append(m[..., None])
    return jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(masks))


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def _sequential_reference(tiny_params, imgs, masks, cfg, s, pool_size=4):
    """The same chunk machinery run one sequence at a time, single
    dispatch — the ground truth both schedules must reproduce."""
    from osvos_tpu.parallel.batched_online import _host_pools
    from osvos_tpu.train.online import make_chunk_fn, make_online_optimizer

    pool_i, pool_m = _host_pools(imgs, masks, cfg, pool_size)
    chunk = jax.jit(make_chunk_fn(TINY, cfg))
    seq_keys = jax.random.split(jax.random.PRNGKey(cfg.seed), s)
    out = []
    for i in range(s):
        p = jax.tree.map(jnp.array, tiny_params)
        tx = make_online_optimizer(p, cfg, "microbatch")
        st = tx.init(p)
        keys_i = jax.random.split(seq_keys[i], cfg.n_steps)
        p_i, _, l_i = chunk(p, st, jnp.asarray(pool_i[i]),
                            jnp.asarray(pool_m[i]), keys_i)
        out.append((p_i, l_i))
    return out


def _assert_matches_sequential(stacked, losses, want):
    for i, (p_i, l_i) in enumerate(want):
        np.testing.assert_allclose(np.asarray(losses[i]), np.asarray(l_i),
                                   rtol=1e-4, err_msg=f"seq {i} losses")
        got = unstack_params(stacked, i)
        flat_g = jax.tree_util.tree_leaves(got)
        flat_w = jax.tree_util.tree_leaves(p_i)
        for g, w in zip(flat_g, flat_w):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_batched_fine_tune_packed_matches_sequential(tiny_params, rng):
    """'packed' (vmapped+sharded+chunked) adaptation == running the same
    chunk fn one sequence at a time with identical pools and key streams."""
    imgs, masks = _pairs(rng, 2)
    cfg = OnlineConfig(n_steps=4, n_ave_grad=2, lr=1e-5, scan_chunk=2)

    mesh = make_mesh("seq", n_devices=2)
    stacked, losses = batched_fine_tune(
        tiny_params, imgs, masks, TINY, cfg, mesh=mesh, aug_mode="pool",
        pool_size=4, schedule="packed")
    assert losses.shape == (2, 4)
    _assert_matches_sequential(stacked, losses,
                               _sequential_reference(tiny_params, imgs, masks,
                                                     cfg, 2))


def test_batched_fine_tune_rounds_matches_sequential(tiny_params, rng):
    """The production 'rounds' scheduler (2 serial rounds of one sequence
    per device: 3 sequences on a 2-device mesh, last round padded) ==
    sequential per-sequence adaptation."""
    imgs, masks = _pairs(rng, 3)
    cfg = OnlineConfig(n_steps=4, n_ave_grad=2, lr=1e-5, scan_chunk=2)

    mesh = make_mesh("seq", n_devices=2)
    stacked, losses = batched_fine_tune(
        tiny_params, imgs, masks, TINY, cfg, mesh=mesh, aug_mode="pool",
        pool_size=4, schedule="rounds")
    assert losses.shape == (3, 4)
    leaves = jax.tree_util.tree_leaves(stacked)
    assert all(l.shape[0] == 3 for l in leaves)
    _assert_matches_sequential(stacked, losses,
                               _sequential_reference(tiny_params, imgs, masks,
                                                     cfg, 3))


def test_batched_fine_tune_rounds_no_mesh(tiny_params, rng):
    """mesh=None rounds degenerate to a serial per-sequence loop on the
    default device (the one-real-chip val protocol) and still match."""
    imgs, masks = _pairs(rng, 2)
    cfg = OnlineConfig(n_steps=2, n_ave_grad=2, lr=1e-5)
    stacked, losses = batched_fine_tune(
        tiny_params, imgs, masks, TINY, cfg, mesh=None, aug_mode="pool",
        pool_size=4, schedule="rounds")
    assert losses.shape == (2, 2)
    _assert_matches_sequential(stacked, losses,
                               _sequential_reference(tiny_params, imgs, masks,
                                                     cfg, 2))


def test_batched_fine_tune_pads_uneven_sequences(tiny_params, rng):
    imgs, masks = _pairs(rng, 3)  # 3 sequences over 2 devices
    cfg = OnlineConfig(n_steps=2, n_ave_grad=1, lr=1e-6)
    mesh = make_mesh("seq", n_devices=2)
    stacked, losses = batched_fine_tune(tiny_params, imgs, masks, TINY, cfg,
                                        mesh=mesh, aug_mode="pool",
                                        pool_size=2)
    # pad-to-mesh (3 -> 4 over 2 devices) must be stripped on return: exactly
    # the 3 real sequences come back, with finite losses.
    assert losses.shape == (3, cfg.n_steps)
    assert np.isfinite(np.asarray(losses)).all()
    leaves = jax.tree_util.tree_leaves(stacked)
    assert all(l.shape[0] == 3 for l in leaves)


def test_batched_infer_sharded(tiny_params, rng):
    imgs, _ = _pairs(rng, 2)
    frames = jnp.stack([imgs, imgs], axis=1)  # (S=2, T=2, H, W, 3)...
    stacked = stack_param_list([tiny_params, tiny_params])
    mesh = make_mesh("seq", n_devices=2)
    out = batched_infer(stacked, frames, TINY, mesh=mesh)
    assert out.shape == (2, 2, 32, 48)
    assert out.dtype == jnp.uint8


def test_batched_infer_chunked_matches_unchunked(tiny_params, rng):
    """The HBM-budget frame chunking (ragged per-sequence lists, padded
    final chunk) must reproduce the single-dispatch padded-stack path
    exactly — including the repeat-last-frame padding semantics."""
    imgs, _ = _pairs(rng, 3)
    lists = [[np.asarray(imgs[i]) * (0.5 + 0.3 * t) for t in range(n)]
             for i, n in enumerate((3, 1, 2))]
    t_max = 3
    stack = np.stack([np.stack(f + [f[-1]] * (t_max - len(f)))
                      for f in lists])
    stacked = stack_param_list([tiny_params] * 3)

    want = np.asarray(batched_infer(stacked, stack, TINY))
    got = batched_infer(stacked, lists, TINY, hbm_budget_bytes=1)
    assert isinstance(got, np.ndarray) and got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)

    mesh = make_mesh("seq", n_devices=2)  # 3 seqs -> padded to 4
    got_mesh = batched_infer(stacked, lists, TINY, mesh=mesh,
                             hbm_budget_bytes=1)
    np.testing.assert_array_equal(got_mesh, want)


def test_batched_infer_static_int8_scales_match_f32(tiny_params, rng):
    """Batched inference with PER-SEQUENCE static int8 scales (traced
    operands through shard_map — one compile for the whole val split) must
    agree with the f32 path on >=99% of thresholded mask pixels."""
    import dataclasses

    from osvos_tpu.models.quantize import calibrate_int8_scales_batched

    # scale the head params up so logits are decisively signed (fresh-init
    # heads sit at ~0 -> sigmoid 0.5, where thresholding is knife-edge)
    p = jax.tree.map(jnp.array, tiny_params)
    for name in ["side_prep1", "side_prep2", "side_prep3", "side_prep4"]:
        p[name]["kernel"] = p[name]["kernel"] * 50.0
    p["fuse"]["kernel"] = p["fuse"]["kernel"] * 200.0

    imgs, _ = _pairs(rng, 2)
    frames = jnp.stack([imgs, imgs[::-1]], axis=1)  # (S=2, T=2, H, W, 3)
    stacked = stack_param_list([p, jax.tree.map(lambda a: a * 1.01, p)])
    mesh = make_mesh("seq", n_devices=2)

    f32 = batched_infer(stacked, frames, TINY, mesh=mesh)

    icfg = dataclasses.replace(TINY, compute_mode="int8")
    scales = calibrate_int8_scales_batched(stacked, frames[:, 0], icfg)
    assert scales.shape[0] == 2 and bool(jnp.all(scales > 0))
    i8 = batched_infer(stacked, frames, icfg, mesh=mesh, act_scales=scales)

    agree = np.mean((np.asarray(f32) >= 128) == (np.asarray(i8) >= 128))
    assert agree >= 0.99, agree


def test_parent_trainer_data_parallel_matches_single(tiny_params, rng):
    imgs, masks = _pairs(rng, 4)
    cfg = ParentConfig(n_epochs=2, batch_size=4, n_ave_grad=1, lr=1e-5)

    t_single = ParentTrainer(tiny_params, TINY, cfg, mesh=None)
    m1 = t_single.train_step(np.asarray(imgs), np.asarray(masks), 1.0)

    mesh = make_mesh("data", n_devices=4)
    t_dp = ParentTrainer(tiny_params, TINY, cfg, mesh=mesh)
    m2 = t_dp.train_step(np.asarray(imgs), np.asarray(masks), 1.0)

    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=1e-4)
    flat1 = jax.tree_util.tree_leaves(t_single.params)
    flat2 = jax.tree_util.tree_leaves(t_dp.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-7)


@pytest.mark.slow
def test_parent_trainer_data_parallel_flat_matches_single(tiny_params, rng):
    """compute_mode='flat' under the DP trainer: the GSPMD partitioner
    cannot split the flat pallas_calls along the batch (it is folded into
    the flat row dim), so ParentTrainer routes flat+mesh through an
    explicit shard_map (each device runs the flat trunk on its local
    shard, grads pmean'd). Must equal the single-device flat step."""
    import dataclasses

    flat_cfg = dataclasses.replace(TINY, compute_mode="flat")
    imgs, masks = _pairs(rng, 4)
    cfg = ParentConfig(n_epochs=1, batch_size=4, n_ave_grad=1, lr=1e-5)

    t_single = ParentTrainer(tiny_params, flat_cfg, cfg, mesh=None)
    m1 = t_single.train_step(np.asarray(imgs), np.asarray(masks), 0.5)

    mesh = make_mesh("data", n_devices=2)
    t_dp = ParentTrainer(tiny_params, flat_cfg, cfg, mesh=mesh)
    m2 = t_dp.train_step(np.asarray(imgs), np.asarray(masks), 0.5)

    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=1e-4)
    # atol 5e-7: pmean-of-local-means reassociates the f32 batch reduction,
    # so near-zero leaves (fresh score_dsn biases ~1e-7 after one lr=1e-5
    # step) carry round-off-level absolute noise.
    for a, b in zip(jax.tree_util.tree_leaves(t_single.params),
                    jax.tree_util.tree_leaves(t_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=5e-7)


def test_parent_trainer_flat_dp_rejects_uneven_batch(tiny_params):
    import dataclasses

    flat_cfg = dataclasses.replace(TINY, compute_mode="flat")
    cfg = ParentConfig(batch_size=3, n_ave_grad=1, lr=1e-5)
    mesh = make_mesh("data", n_devices=2)
    with pytest.raises(ValueError, match="divisible"):
        ParentTrainer(tiny_params, flat_cfg, cfg, mesh=mesh)


def test_frame_parallel_infer_matches_single_device(tiny_params, rng):
    """Frame-sharded inference (shard_map over the batch axis) must equal
    the single-device path."""
    from osvos_tpu.evaluation.infer import (infer_sequence,
                                            make_sharded_infer_fn)

    imgs, _ = _pairs(rng, 8)
    frames = [np.asarray(imgs[i]) for i in range(8)]
    mesh = make_mesh("data", n_devices=4)
    got = infer_sequence(tiny_params, frames, TINY, batch_size=4, mesh=mesh)
    want = infer_sequence(tiny_params, frames, TINY, batch_size=4)
    assert len(got) == len(want) == 8
    for g, w in zip(got, want):
        assert g.shape == w.shape
        assert (np.abs(g.astype(int) - w.astype(int)) <= 1).all()
