"""Rollout-equivalence tests: compiled scan/while rollouts vs. Python-loop
references (the reference's window-slide semantics, trainer/trainer.py:144-159)."""

import jax
import jax.numpy as jnp
import numpy as np

from tante_tpu.train.rollout import (
    rollout_adaptive_eval,
    rollout_adaptive_train,
    rollout_adaptive_train_vf,
    rollout_fixed,
)

B, T, H, W, C = 2, 4, 5, 6, 3


def linear_step_model(chunk):
    """A deterministic fake model: emits `chunk` frames, each a simple
    function of the window so the rollout wiring is observable."""

    def apply_fn(window):
        base = jnp.mean(window, axis=1, keepdims=True)  # (B,1,H,W,C)
        return jnp.concatenate(
            [base * (1.0 + 0.1 * k) for k in range(chunk)], axis=1
        )

    return apply_fn


def python_rollout(apply_fn, window, n_steps):
    """Direct transliteration of the reference while-loop semantics."""
    t_in = window.shape[1]
    preds = []
    cum = 0
    while cum < n_steps:
        y = apply_fn(window)
        cum += y.shape[1]
        if cum < n_steps:
            window = jnp.concatenate([window, y], axis=1)[:, -t_in:]
        preds.append(y)
    return jnp.concatenate(preds, axis=1)[:, :n_steps]


def test_rollout_fixed_matches_python_loop():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, W, C))
    for chunk, n_steps in [(1, 4), (2, 8), (3, 8), (4, 4)]:
        fn = linear_step_model(chunk)
        got = rollout_fixed(fn, x, n_steps, chunk)
        want = python_rollout(fn, x, n_steps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def adaptive_fake_model(n_frames, rt_value):
    def apply_fn(window):
        base = jnp.mean(window, axis=1, keepdims=True)
        frames = jnp.concatenate(
            [base * (1.0 + 0.1 * k) for k in range(n_frames)], axis=1
        )
        rt = jnp.full((window.shape[0],), rt_value)
        return frames, rt

    return apply_fn


def test_rollout_adaptive_train_single_frame_calls():
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, C))
    fn = adaptive_fake_model(1, 1.3)
    y, rts = rollout_adaptive_train(fn, x, 4)
    assert y.shape == (B, 4, H, W, C)
    assert rts.shape == (4, B)
    # Equivalent fixed rollout with chunk 1
    fixed = rollout_fixed(lambda w: fn(w)[0], x, 4, 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(fixed), rtol=1e-5)


def test_rollout_adaptive_eval_emits_floor_rt():
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, W, C))
    n_steps = 8

    # rt = 3.7 -> 3 frames consumed per call -> ceil(8/3) = 3 calls.
    fn = adaptive_fake_model(n_steps, 3.7)
    y, rt_log, n_calls = rollout_adaptive_eval(fn, x, n_steps)
    assert int(n_calls) == 3
    rt_np = np.asarray(rt_log)
    assert np.sum(~np.isnan(rt_np)) == 3
    np.testing.assert_allclose(rt_np[~np.isnan(rt_np)], 3.7, rtol=1e-6)

    # Python reference: emit floor(rt) frames per call.
    def python_adaptive(window):
        t_in = window.shape[1]
        preds = []
        cum = 0
        while cum < n_steps:
            frames, rt = fn(window)
            emit = int(np.floor(float(rt[0])))
            y_emit = frames[:, :emit]
            cum += emit
            window = jnp.concatenate([window, y_emit], axis=1)[:, -t_in:]
            preds.append(y_emit)
        return jnp.concatenate(preds, axis=1)[:, :n_steps]

    want = python_adaptive(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5)


def test_rollout_adaptive_eval_rt_one_equals_fixed():
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, H, W, C))
    fn = adaptive_fake_model(4, 1.2)  # floor -> 1 frame per call
    y, _, n_calls = rollout_adaptive_eval(fn, x, 4)
    assert int(n_calls) == 4
    fixed = rollout_fixed(lambda w: fn(w)[0][:, :1], x, 4, 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(fixed), rtol=1e-5)


def test_rollout_adaptive_eval_force_budget():
    """force_budget emits the full K-frame block regardless of r_t:
    n_steps/K calls, output == an adaptive head that always says K."""
    x = jax.random.normal(jax.random.PRNGKey(7), (B, T, H, W, C))
    n_steps, k = 8, 4
    fn = adaptive_fake_model(k, 1.9)  # head says 1 frame; budget forces 4
    y, _, n_calls = rollout_adaptive_eval(
        fn, x, n_steps, max_frames_per_call=k, force_budget=True
    )
    assert int(n_calls) == n_steps // k
    always_k = adaptive_fake_model(k, float(k) + 0.0006)
    want, _, want_calls = rollout_adaptive_eval(
        always_k, x, n_steps, max_frames_per_call=k
    )
    assert int(want_calls) == n_steps // k
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5)


def test_rollout_adaptive_train_vf_matches_eval_engine():
    """The differentiable variable-frame TRAIN engine must produce the
    same trajectory (frames consumed, window slides) as the while-loop
    eval engine for the same r_t policy."""
    x = jax.random.normal(jax.random.PRNGKey(7), (B, T, H, W, C))
    n_steps = 8
    for rt_value in [1.2, 2.4, 3.7, 4.9]:
        k = 4
        fn = adaptive_fake_model(k, rt_value)
        y_vf, rts, actives, cums = rollout_adaptive_train_vf(fn, x, n_steps, k)
        y_ev, _, n_calls = rollout_adaptive_eval(
            fn, x, n_steps, max_frames_per_call=k
        )
        assert y_vf.shape == (B, n_steps, H, W, C)
        np.testing.assert_allclose(
            np.asarray(y_vf), np.asarray(y_ev), rtol=1e-5
        )
        # actives is per-sample (n_steps, B); with a batch-uniform r_t
        # every sample's call count equals the eval engine's.
        act = np.asarray(actives)
        assert act.shape == (n_steps, B)
        assert (act.sum(axis=0) == int(n_calls)).all()
        assert rts.shape == (n_steps, B)


def test_rollout_adaptive_train_vf_is_differentiable():
    """Gradients flow through surviving frames; speculative-tail frames
    (overwritten by the next call) receive zero gradient but don't break
    the chain."""
    x = jax.random.normal(jax.random.PRNGKey(8), (B, T, H, W, C))
    w0 = jnp.ones((C,))

    def loss(w):
        def fn(win):
            base = jnp.mean(win, axis=1, keepdims=True) * w
            frames = jnp.concatenate([base * (1.0 + 0.1 * j) for j in range(3)], axis=1)
            rt = jnp.full((win.shape[0],), 2.5)
            return frames, rt

        y, rts, actives, _ = rollout_adaptive_train_vf(fn, x, 8, 3)
        return jnp.sum(y**2)

    g = jax.grad(loss)(w0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

    # remat=True (R_Trainer's gradient_checkpointing) is a pure
    # memory/recompute trade: value and gradient must be unchanged.
    def loss_remat(w):
        def fn(win):
            base = jnp.mean(win, axis=1, keepdims=True) * w
            frames = jnp.concatenate([base * (1.0 + 0.1 * j) for j in range(3)], axis=1)
            rt = jnp.full((win.shape[0],), 2.5)
            return frames, rt

        y, _, _, _ = rollout_adaptive_train_vf(fn, x, 8, 3, remat=True)
        return jnp.sum(y**2)

    g_r = jax.grad(loss_remat)(w0)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g), rtol=1e-6)


def test_rollout_adaptive_train_vf_k1_equals_reference_trainer():
    """k=1 degenerates to the reference's one-frame-per-call trainer."""
    x = jax.random.normal(jax.random.PRNGKey(9), (B, T, H, W, C))
    fn = adaptive_fake_model(1, 1.3)
    y_vf, _, actives, _ = rollout_adaptive_train_vf(fn, x, 4, 1)
    y_ref, _ = rollout_adaptive_train(fn, x, 4)
    np.testing.assert_allclose(np.asarray(y_vf), np.asarray(y_ref), rtol=1e-5)
    assert (np.asarray(actives).sum(axis=0) == 4).all()


def test_rollout_adaptive_train_vf_per_sample_emission():
    """Each sample advances by its OWN floor(r_t_i) — the reference's
    per-sample training semantics (its batch-of-1 loop,
    r_trainer.py:118), not the eval-time batch-item-0 quirk.  Verified by
    running each sample alone through the eval engine and comparing."""
    x = jax.random.normal(jax.random.PRNGKey(10), (B, T, H, W, C))
    n_steps, k = 8, 4
    per_sample_rt = jnp.array([1.2, 3.7][:B])

    def fn(window):
        base = jnp.mean(window, axis=1, keepdims=True)
        frames = jnp.concatenate(
            [base * (1.0 + 0.1 * j) for j in range(k)], axis=1
        )
        return frames, jnp.broadcast_to(per_sample_rt[: window.shape[0]], (window.shape[0],))

    y_vf, rts, actives, cums = rollout_adaptive_train_vf(fn, x, n_steps, k)
    act = np.asarray(actives)
    for i in range(B):
        rt_i = float(per_sample_rt[i])

        def fn_i(window, rt_i=rt_i):
            base = jnp.mean(window, axis=1, keepdims=True)
            frames = jnp.concatenate(
                [base * (1.0 + 0.1 * j) for j in range(k)], axis=1
            )
            return frames, jnp.full((window.shape[0],), rt_i)

        y_i, _, n_calls_i = rollout_adaptive_eval(
            fn_i, x[i : i + 1], n_steps, max_frames_per_call=k
        )
        np.testing.assert_allclose(
            np.asarray(y_vf[i : i + 1]), np.asarray(y_i), rtol=1e-5
        )
        assert int(act[:, i].sum()) == int(n_calls_i)


def test_rollout_fixed_is_differentiable():
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, H, W, C))
    w0 = jnp.ones((C,))

    def loss(w):
        fn = lambda win: jnp.mean(win, axis=1, keepdims=True) * w
        y = rollout_fixed(fn, x, 4, 1)
        return jnp.sum(y**2)

    g = jax.grad(loss)(w0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_rollout_tante_latent_matches_standard():
    """Latent-caching rollout must equal the recompute-everything rollout."""
    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE
    from tante_tpu.train.rollout import rollout_tante_latent

    md = TanteMetadata(
        dataset_name="s",
        n_spatial_dims=2,
        spatial_resolution=(16, 32),
        field_names={0: ["a", "b", "c"], 1: [], 2: []},
        boundary_condition_types=[],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[8],
        n_fields=3,
    )
    model = TANTE(
        in_T=4,
        dset_metadata=md,
        taylor_order=2,
        attn_axes="TH-W",
        embed_dim=32,
        patch_scale=8,
        n_head=4,
        output_length=2,
        deg=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)

    want = rollout_fixed(lambda w: model.apply(params, w), x, 6, 2)
    got = rollout_tante_latent(model, params, x, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_rollout_adaptive_eval_tante_matches_generic():
    """The morton-packed adaptive engine must reproduce the generic
    while-loop engine's emissions exactly, across r_t operating points
    (1, 2 and 4 frames per call via a doctored interprator bias)."""
    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE
    from tante_tpu.train.rollout import (
        rollout_adaptive_eval,
        rollout_adaptive_eval_tante,
    )

    md = TanteMetadata(
        dataset_name="s",
        n_spatial_dims=2,
        spatial_resolution=(16, 48),
        field_names={0: ["a", "b", "c"], 1: [], 2: []},
        boundary_condition_types=[],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[8],
        n_fields=3,
    )
    model = TANTE(
        in_T=4,
        dset_metadata=md,
        taylor_order=1,
        attn_axes="THW",
        embed_dim=32,  # engine-equivalence test: size is irrelevant, CPU
        patch_scale=8,  # compile cost is not (two while-loop programs)
        n_head=2,
        output_length=1,
        deg=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 48, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    assert model.morton_io_ok()

    for bias in (None, 2.999):  # 1-frame and 3-frame emission regimes
        p = params
        if bias is not None:
            p = jax.tree_util.tree_map(lambda a: a, params)
            head = p["params"]["interprators_0"]["TorchDense_2"]["Dense_0"]
            head["kernel"] = jnp.zeros_like(head["kernel"])
            head["bias"] = jnp.full_like(head["bias"], bias)
        ref, rt_ref, n_ref = rollout_adaptive_eval(
            lambda w: model.apply(p, w, 4.0, deterministic=True),
            x,
            7,
            max_frames_per_call=4,
        )
        got, rt_got, n_got = rollout_adaptive_eval_tante(
            model, p, x, 7, max_frames_per_call=4
        )
        assert int(n_ref) == int(n_got)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
        np.testing.assert_allclose(np.asarray(rt_got), np.asarray(rt_ref), atol=1e-5)
