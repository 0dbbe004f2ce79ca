"""Every shipped config must instantiate its model via the registry and run
one (tiny) forward — catches config-key/constructor mismatches."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from tante_tpu.config import instantiate, load_config
from tante_tpu.data.dataset import TanteMetadata

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))
)

MD = TanteMetadata(
    dataset_name="synthetic",
    n_spatial_dims=2,
    spatial_resolution=(32, 64),
    field_names={0: ["a"], 1: ["v_x", "v_y"], 2: []},
    boundary_condition_types=["PERIODIC"],
    n_files=1,
    n_trajectories_per_file=[2],
    n_steps_per_trajectory=[24],
    n_fields=3,
)

# Tiny-size overrides per model family so forwards are fast on CPU.
SHRINK = {
    "tante": ["model.embed_dim=32", "model.n_head=4", "model.attn_axes=TH"],
    "tante_adaptive": ["model.embed_dim=32", "model.n_head=4", "model.attn_axes=TH"],
    "fno": ["model.hidden_channels=8", "model.modes1=4", "model.modes2=4"],
    "fno3d": [
        "model.hidden_channels=8",
        "model.modes1=4",
        "model.modes2=4",
        "model.modes3=4",
    ],
    "tfno": ["model.hidden_channels=8", "model.modes1=4", "model.modes2=4"],
    "afno": ["model.hidden_dim=32", "model.n_blocks=1"],
    "uno": ["model.width=8"],
    "dpot": [
        "model.embed_dim=64",
        "model.depth=1",
        "model.patch_size=16",
        "model.out_layer_dim=8",
    ],
    "avit": ["model.embed_dim=32", "model.num_heads=4", "model.processor_blocks=1"],
    "cvit": [
        "model.emb_dim=32",
        "model.dec_emb_dim=32",
        "model.depth=1",
        "model.grid_size=[8, 8]",
        "model.latent_dim=16",
        "model.patch_size=[1, 16, 16]",
    ],
    "unet_att": ["model.depth=3"],
    "unet_convnext": ["model.init_features=4", "model.blocks_per_stage=1"],
}


@pytest.mark.parametrize("name", CONFIGS)
def test_config_model_instantiates_and_runs(name):
    cfg = load_config(name, overrides=SHRINK.get(name, []))
    model = instantiate(cfg.model, dset_metadata=MD)
    x = jnp.ones((1, cfg.data.n_steps_input, 32, 64, 3))

    # init_with_output: one forward pass checks both construction and run
    # (a separate apply() doubled the CPU eager cost of this file).
    is_adaptive = not getattr(model, "deg", True)
    is_cvit = cfg.trainer.get("cvit", False)
    if is_cvit:
        coords = jnp.zeros((8, 2))
        y, _ = model.init_with_output(jax.random.PRNGKey(0), x, coords)
        assert y.shape[0] == 1 and y.shape[2] == 8 and y.shape[3] == 3
    elif is_adaptive:
        (y, rt), _ = model.init_with_output(jax.random.PRNGKey(0), x, 1.5)
        assert y.shape == (1, 1, 32, 64, 3)
        assert rt.shape == (1,)
    else:
        y, _ = model.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape[0] == 1 and y.shape[2:] == (32, 64, 3)

    # Losses/optimizer/scheduler instantiate through the registry too.
    assert callable(instantiate(cfg.trainer.train_loss_fn))
    assert callable(instantiate(cfg.evaler.eval_loss_fn4))
    opt = instantiate(cfg.optimizer)
    assert hasattr(opt, "make")
