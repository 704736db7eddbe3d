"""Training-path tests: optimizer group semantics vs torch SGD, online
fine-tune learning on synthetic data, parent step integration
(SURVEY.md §4a/b; all tiny shapes, CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from osvos_tpu.configs import ModelConfig, OnlineConfig, ParentConfig
from osvos_tpu.models import init_osvos_params
from osvos_tpu.ops.loss import class_balanced_cross_entropy_loss
from osvos_tpu.train.online import make_fine_tune_fn
from osvos_tpu.train.optim import make_osvos_optimizer, param_group_label
from osvos_tpu.train.parent import ParentTrainer

TINY = ModelConfig(stages=((4, 4), (6, 6), (8, 8, 8), (8, 8, 8), (8, 8, 8)),
                   side_channels=4, compute_mode="parity")


@pytest.fixture(scope="module")
def tiny_params():
    return init_osvos_params(jax.random.PRNGKey(0), TINY, input_hw=(32, 48))


def test_param_group_labels(tiny_params):
    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: param_group_label(p), tiny_params)
    assert labels["stage1_conv0"]["kernel"] == "stage_w"
    assert labels["stage1_conv0"]["bias"] == "stage_b"
    assert labels["side_prep3"]["kernel"] == "side_w"
    assert labels["score_dsn2"]["bias"] == "dsn_b"
    assert labels["fuse"]["kernel"] == "fuse_w"


def test_grouped_sgd_matches_torch_semantics(rng):
    """One param per group type; several steps of our optax chain must match
    torch.optim.SGD with the reference group dict exactly."""
    w0 = rng.randn(3, 3).astype(np.float32)
    b0 = rng.randn(3).astype(np.float32)
    lr, momentum, wd = 0.01, 0.9, 0.0002

    params = {"fuse": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = make_osvos_optimizer(params, base_lr=lr, momentum=momentum,
                              weight_decay=wd)
    state = tx.init(params)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    topt = torch.optim.SGD(
        [{"params": [tw], "lr": lr / 100, "weight_decay": wd},
         {"params": [tb], "lr": 2 * lr / 100}],
        lr=lr, momentum=momentum)

    for step in range(5):
        g_w = rng.randn(3, 3).astype(np.float32)
        g_b = rng.randn(3).astype(np.float32)
        grads = {"fuse": {"kernel": jnp.asarray(g_w), "bias": jnp.asarray(g_b)}}
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda a, b: a + b, params, updates)

        topt.zero_grad()
        tw.grad = torch.from_numpy(g_w.copy())
        tb.grad = torch.from_numpy(g_b.copy())
        topt.step()

        np.testing.assert_allclose(np.asarray(params["fuse"]["kernel"]),
                                   tw.detach().numpy(), rtol=2e-5, atol=1e-7,
                                   err_msg=f"kernel step {step}")
        np.testing.assert_allclose(np.asarray(params["fuse"]["bias"]),
                                   tb.detach().numpy(), rtol=2e-5, atol=1e-7,
                                   err_msg=f"bias step {step}")


def test_grad_accumulation_matches_big_batch(rng):
    """MultiSteps(k) over k microbatches == one step on the mean gradient."""
    w0 = rng.randn(4).astype(np.float32)
    params = {"fuse": {"kernel": jnp.asarray(w0)}}
    k = 4
    grads = [np.asarray(rng.randn(4), np.float32) for _ in range(k)]

    tx_acc = make_osvos_optimizer(params, base_lr=0.1, momentum=0.9,
                                  weight_decay=0.0, n_ave_grad=k)
    st = tx_acc.init(params)
    p_acc = params
    for g in grads:
        up, st = tx_acc.update({"fuse": {"kernel": jnp.asarray(g)}}, st, p_acc)
        p_acc = jax.tree.map(lambda a, b: a + b, p_acc, up)

    tx_one = make_osvos_optimizer(params, base_lr=0.1, momentum=0.9,
                                  weight_decay=0.0, n_ave_grad=1)
    st1 = tx_one.init(params)
    mean_g = np.mean(grads, axis=0)
    up, _ = tx_one.update({"fuse": {"kernel": jnp.asarray(mean_g)}}, st1,
                          params)
    p_one = jax.tree.map(lambda a, b: a + b, params, up)

    np.testing.assert_allclose(np.asarray(p_acc["fuse"]["kernel"]),
                               np.asarray(p_one["fuse"]["kernel"]), rtol=1e-6)


def _synthetic_pair(rng, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([np.sin(xx / 5), np.cos(yy / 4), (xx + yy) / (h + w)], -1)
    img = (img * 60).astype(np.float32)
    mask = (((yy - h / 2) / (h / 4)) ** 2 + ((xx - w / 2) / (w / 4)) ** 2
            <= 1).astype(np.float32)[..., None]
    img += np.where(mask > 0, 80.0, 0.0)  # object is distinguishable
    return img, mask


def test_online_fine_tune_reduces_loss_and_learns(tiny_params, rng):
    img, mask = _synthetic_pair(rng)
    cfg = OnlineConfig(n_steps=30, n_ave_grad=2, lr=1e-5)
    ft = make_fine_tune_fn(TINY, cfg, aug_mode="pool", pool_size=4)
    new_params, losses = jax.jit(ft)(tiny_params, jnp.asarray(img),
                                     jnp.asarray(mask),
                                     jax.random.PRNGKey(0))
    assert losses.shape == (30,)
    assert np.isfinite(np.asarray(losses)).all()
    assert float(losses[-5:].mean()) < float(losses[:5].mean())

    # prediction moves toward the mask
    from osvos_tpu.models import OSVOS

    model = OSVOS(TINY)
    logits = model.apply({"params": new_params}, jnp.asarray(img[None]))[-1]
    pred = np.asarray(jax.nn.sigmoid(logits))[0]
    inside = pred[np.asarray(mask)[..., 0] > 0.5].mean()
    outside = pred[np.asarray(mask)[..., 0] < 0.5].mean()
    assert inside > outside


def test_online_per_step_aug_mode_runs(tiny_params, rng):
    img, mask = _synthetic_pair(rng)
    cfg = OnlineConfig(n_steps=2, n_ave_grad=1, lr=1e-6)
    ft = make_fine_tune_fn(TINY, cfg, aug_mode="per_step")
    _, losses = jax.jit(ft)(tiny_params, jnp.asarray(img), jnp.asarray(mask),
                            jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(losses)).all()


def test_parent_trainer_single_device(tiny_params, rng):
    cfg = ParentConfig(n_epochs=4, batch_size=2, n_ave_grad=2, lr=1e-5)
    trainer = ParentTrainer(tiny_params, TINY, cfg, mesh=None)
    img, mask = _synthetic_pair(rng)
    images = np.stack([img, img])
    gts = np.stack([mask, mask])
    losses = []
    for epoch in range(4):
        side_w = 1.0 - epoch / cfg.n_epochs
        for _ in range(4):
            m = trainer.train_step(images, gts, side_w)
            losses.append(float(m["total"]))
        assert np.isfinite(trainer.val_loss(images, gts))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_deep_supervision_annealing_weights_losses(tiny_params, rng):
    from osvos_tpu.train.parent import make_parent_train_step

    cfg = ParentConfig(lr=1e-5)
    loss_fn, _, _ = make_parent_train_step(TINY, cfg)
    img, mask = _synthetic_pair(rng)
    total_full, per = loss_fn(tiny_params, jnp.asarray(img[None]),
                              jnp.asarray(mask[None]), jnp.float32(1.0))
    total_anneal, _ = loss_fn(tiny_params, jnp.asarray(img[None]),
                              jnp.asarray(mask[None]), jnp.float32(0.0))
    np.testing.assert_allclose(float(total_full),
                               float(np.asarray(per)[:4].sum() + per[-1]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(total_anneal), float(per[-1]),
                               rtol=1e-6)


def test_checkpoint_roundtrip_with_multisteps_opt_state(tiny_params, tmp_path):
    """save/load must handle optax MultiStepsState (custom pytree nodes the
    msgpack layer can't pack raw — regression: train_parent snapshots)."""
    from osvos_tpu.train.optim import make_osvos_optimizer
    from osvos_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    tx = make_osvos_optimizer(tiny_params, base_lr=1e-6, n_ave_grad=3)
    opt_state = tx.init(tiny_params)
    path = str(tmp_path / "snap.ckpt")
    save_checkpoint(path, tiny_params, opt_state, step=7)
    p2, st2, step = load_checkpoint(path, tiny_params, opt_state)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(tiny_params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    la = jax.tree_util.tree_leaves(opt_state)
    lb = jax.tree_util.tree_leaves(st2)
    assert len(la) == len(lb) and len(la) > 0
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_microbatch_step_equals_sequential_accumulation(tiny_params, rng):
    """One batched n_ave_grad-sample step == n_ave_grad accumulate-then-step
    microsteps (identical mean gradient and SGD timing). With pool_size=1
    and no flips every draw is the identity sample, so the two regimes see
    the same data and must produce near-identical trajectories."""
    from osvos_tpu.train.online import make_fine_tune_fn

    img, mask = _synthetic_pair(rng)
    cfg = OnlineConfig(n_steps=3, n_ave_grad=3, lr=1e-5, hflip_prob=0.0)
    key = jax.random.PRNGKey(0)

    outs = {}
    for mode in ("microbatch", "sequential"):
        ft = make_fine_tune_fn(TINY, cfg, aug_mode="pool", pool_size=1,
                               step_mode=mode)
        p = jax.tree.map(jnp.array, tiny_params)
        outs[mode] = jax.jit(ft)(p, jnp.asarray(img), jnp.asarray(mask), key)

    p_mb, l_mb = outs["microbatch"]
    p_sq, l_sq = outs["sequential"]
    np.testing.assert_allclose(np.asarray(l_mb), np.asarray(l_sq), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_mb),
                    jax.tree_util.tree_leaves(p_sq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-7)


def test_parent_batch_step_equals_accumulated_singles(tiny_params, rng):
    """ONE batch-n parent step (per-sample balanced losses, mean) must equal
    n accumulated batch-1 steps with MultiSteps — the reference's
    batch=1 + nAveGrad regime at full batch efficiency."""
    n = 3
    imgs = np.stack([_synthetic_pair(rng)[0] for _ in range(n)])
    masks = np.stack([_synthetic_pair(rng)[1] for _ in range(n)])

    cfg_b = ParentConfig(batch_size=n, n_ave_grad=1, lr=1e-5)
    t_b = ParentTrainer(tiny_params, TINY, cfg_b)
    t_b.train_step(imgs, masks, side_weight=1.0)

    cfg_s = ParentConfig(batch_size=1, n_ave_grad=n, lr=1e-5)
    t_s = ParentTrainer(tiny_params, TINY, cfg_s)
    for b in range(n):
        t_s.train_step(imgs[b:b + 1], masks[b:b + 1], side_weight=1.0)

    for a, b in zip(jax.tree_util.tree_leaves(t_b.params),
                    jax.tree_util.tree_leaves(t_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-8)
