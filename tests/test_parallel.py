"""Multi-device sharding tests on the 8-virtual-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tante_tpu.parallel import batch_sharding, dp_tp_mesh, make_mesh, param_shardings

cpu_devices = jax.devices("cpu")
requires_8 = pytest.mark.skipif(len(cpu_devices) < 8, reason="needs 8 virtual devices")


@requires_8
def test_make_mesh_shapes():
    mesh = make_mesh(8, ("dp", "tp"), (4, 2), devices=cpu_devices)
    assert mesh.devices.shape == (4, 2)
    mesh2 = dp_tp_mesh(8)
    assert int(np.prod(mesh2.devices.shape)) == 8


@requires_8
def test_batch_sharded_data_parallel_matmul():
    mesh = make_mesh(8, ("dp", "tp"), (8, 1), devices=cpu_devices)
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    y = jax.jit(lambda a: (a * 2).sum())(xs)
    np.testing.assert_allclose(float(y), float((x * 2).sum()))


@requires_8
def test_tp_param_sharding_rules():
    from tante_tpu.ops.attention import MultiheadAttention

    mesh = make_mesh(8, ("dp", "tp"), (4, 2), devices=cpu_devices)
    m = MultiheadAttention(embed_dim=32, num_heads=4)
    x = jnp.ones((2, 6, 32))
    params = m.init(jax.random.PRNGKey(0), x)
    shardings = param_shardings(params, mesh)

    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec for path, s in flat}
    qkv = [v for k, v in specs.items() if "q_proj" in k and "kernel" in k]
    assert qkv and all(tuple(s) == (None, "tp") for s in qkv)
    outp = [v for k, v in specs.items() if "out_proj" in k and "kernel" in k]
    assert outp and all(tuple(s) == ("tp", None) for s in outp)


@requires_8
def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, (params, x) = g.entry()
    out = jax.jit(fn)(params, x)
    assert out.shape == (2, 1, 64, 128, 4)
