"""Model factory: params['model_type'] string -> constructed flax module.

Parity target: get_model.py:9-249 (12 model configurations). Models are
added to _BUILDERS as they land; get_model also sets
params['model_returns_vaeloss'] exactly like the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.models.ms_dsa_net import MS_DSA_NET, MS_DSA_NET_PS, BaseUNet

_LEAKY = ("leakyrelu", {"negative_slope": 0.01})


def _dtype_of(params) -> Optional[Any]:
    if params.get("use_amp", True):
        return jnp.dtype(params.get("compute_dtype", "bfloat16"))
    return None


def _triple(x):
    if isinstance(x, (tuple, list)):
        return tuple(int(v) for v in x)
    return (int(x),) * 3


def _build_ms_dsa_net(params):
    return MS_DSA_NET(
        out_channels=params["chans_out"],
        img_size=_triple(params["patch_size"]),
        feature_size=params["feature_size"],
        project_size=params["project_size"],
        pos_embed=True,
        sa_type=params["sa_type"],
        norm_name="instance",
        act_name=_LEAKY,
        res_block=True,
        use_bias=False,
        dropout_rate=0.1,
        dtype=_dtype_of(params),
    )


def _build_ms_dsa_net_ps(params):
    return MS_DSA_NET_PS(
        out_channels=params["chans_out"],
        img_size=_triple(params["patch_size"]),
        feature_size=params["feature_size"],
        project_size=params["project_size"],
        pos_embed=True,
        sa_type=params["sa_type"],
        norm_name="instance",
        act_name=_LEAKY,
        res_block=True,
        use_bias=False,
        dropout_rate=0.1,
        upsample_mode="pixelshuffle",
        dtype=_dtype_of(params),
    )


def _build_baseunet(params):
    return BaseUNet(
        out_channels=params["chans_out"],
        feature_size=params["feature_size"],
        norm_name="instance",
        act_name=_LEAKY,
        res_block=True,
        use_bias=False,
        depth=6,
        dtype=_dtype_of(params),
    )


def _segresnet_blocks(params):
    deeper = params.get("segresnet_deeper", False)
    blocks_down = (1, 2, 2, 4, 4) if deeper else (1, 2, 2, 4)
    blocks_up = (2, 2, 2, 2) if deeper else (1, 1, 1)
    return blocks_down, blocks_up


def _build_segresnet(params):
    from fcd_tpu.models.segresnet import SegResNet

    blocks_down, blocks_up = _segresnet_blocks(params)
    return SegResNet(
        out_channels=params["chans_out"],
        init_filters=params["feature_size"],
        dropout_prob=0.1,
        act=("relu", {}),
        norm="instance",
        upsample_mode=params["segresnet_upsample_mode"],
        blocks_down=blocks_down,
        blocks_up=blocks_up,
        dtype=_dtype_of(params),
    )


def _build_segresnetvae(params):
    from fcd_tpu.models.segresnet import SegResNetVAE

    blocks_down, blocks_up = _segresnet_blocks(params)
    return SegResNetVAE(
        in_channels=params["chans_in"],
        input_image_size=_triple(params["patch_size"]),
        vae_estimate_std=False,
        vae_default_std=0.3,
        vae_nz=256,
        out_channels=params["chans_out"],
        init_filters=params["feature_size"],
        dropout_prob=0.1,
        norm="instance",
        upsample_mode=params["segresnet_upsample_mode"],
        blocks_down=blocks_down,
        blocks_up=blocks_up,
        dtype=_dtype_of(params),
    )


def _build_segresnet_dsa(params):
    from fcd_tpu.models.segresnet_dsa import SegResNet_DSA

    blocks_down, blocks_up = _segresnet_blocks(params)
    return SegResNet_DSA(
        out_channels=params["chans_out"],
        init_filters=params["feature_size"],
        dropout_prob=0.1,
        norm="instance",
        upsample_mode=params["segresnet_upsample_mode"],
        blocks_down=blocks_down,
        blocks_up=blocks_up,
        dsa_img_size=_triple(params["patch_size"]),
        dsa_project_size=params["project_size"],
        dsa_num_heads=4,
        dsa_pos_embed=True,
        dsa_dropout_rate=0.1,
        dsa_sa_type=params["sa_type"],
        dsa_num_layers=3,
        dsa_start_level=len(blocks_down) - 2,
        dtype=_dtype_of(params),
    )


def _build_segresnetvae_dsa(params):
    from fcd_tpu.models.segresnet_dsa import SegResNetVAE_DSA

    blocks_down, blocks_up = _segresnet_blocks(params)
    return SegResNetVAE_DSA(
        in_channels=params["chans_in"],
        input_image_size=_triple(params["patch_size"]),
        vae_estimate_std=False,
        vae_default_std=0.3,
        vae_nz=256,
        out_channels=params["chans_out"],
        init_filters=params["feature_size"],
        dropout_prob=0.1,
        norm="instance",
        upsample_mode=params["segresnet_upsample_mode"],
        blocks_down=blocks_down,
        blocks_up=blocks_up,
        dsa_img_size=_triple(params["patch_size"]),
        dsa_project_size=params["project_size"],
        dsa_num_heads=4,
        dsa_pos_embed=True,
        dsa_dropout_rate=0.1,
        dsa_sa_type=params["sa_type"],
        dsa_num_layers=3,
        dsa_start_level=len(blocks_down) - 2,
        dtype=_dtype_of(params),
    )


def _build_unetrpp(params):
    from fcd_tpu.models.unetr_pp import UNETR_PP

    fs = params["feature_size"]
    return UNETR_PP(
        out_channels=params["chans_out"],
        in_channels_hint=params["chans_in"],
        feature_size=fs,
        hidden_size=fs * 16,
        num_heads=4,
        depths=(3, 3, 3, 3),
        dims=(fs * 2, fs * 4, fs * 8, fs * 16),  # (32,64,128,256) at fs=16
        patch_size=_triple(params["patch_size"]),
        norm_name="instance",
        do_ds=False,
        dropout_rate=0.1,
        dtype=_dtype_of(params),
    )


def _build_unet(params):
    from fcd_tpu.models.unet import UNet

    return UNet(
        out_channels=params["chans_out"],
        channels=(16, 32, 64, 128, 256, 512),
        strides=(2, 2, 2, 2, 2),
        num_res_units=2,
        norm="instance",
        act="prelu",
        dropout=0.1,
        dtype=_dtype_of(params),
    )


def _build_vnet(params):
    from fcd_tpu.models.vnet import VNet

    return VNet(
        out_channels=params["chans_out"],
        act=("prelu", {"init": 0.2}),
        dropout_prob=0.5,
        dtype=_dtype_of(params),
    )


def _build_unetr(params):
    from fcd_tpu.models.unetr import UNETR

    return UNETR(
        out_channels=params["chans_out"],
        img_size=_triple(params["patch_size"]),
        feature_size=params["feature_size"],
        hidden_size=768,
        mlp_dim=1024,
        num_heads=12,
        norm_name="instance",
        res_block=True,
        dropout_rate=0.1,
        dtype=_dtype_of(params),
    )


def _build_swinunetr(params):
    from fcd_tpu.models.swin_unetr import SwinUNETR

    return SwinUNETR(
        out_channels=params["chans_out"],
        feature_size=24,
        dtype=_dtype_of(params),
    )


_BUILDERS = {
    "ms_dsa_net": _build_ms_dsa_net,
    "ms_dsa_net_ps": _build_ms_dsa_net_ps,
    "baseunet": _build_baseunet,
    "segresnet": _build_segresnet,
    "segresnetvae": _build_segresnetvae,
    "segresnet_dsa": _build_segresnet_dsa,
    "segresnetvae_dsa": _build_segresnetvae_dsa,
    "unetrpp": _build_unetrpp,
    "unet": _build_unet,
    "vnet": _build_vnet,
    "unetr": _build_unetr,
    "swinunetr": _build_swinunetr,
}

_VAE_MODELS = {"segresnetvae", "segresnetvae_dsa"}


def get_model(params: Dict[str, Any], return_model: bool = True):
    """Build the configured model; mirrors get_model.py:9-249 including the
    model_returns_vaeloss side effect."""
    model_type = params["model_type"].lower()
    params["model_returns_vaeloss"] = model_type in _VAE_MODELS
    if model_type not in _BUILDERS:
        raise ValueError(f"Unknown model_type: {params['model_type']}")
    model = _BUILDERS[model_type](params) if return_model else None
    return model, params


def init_model(model, params: Dict[str, Any], seed: int = 0):
    """Initialize variables with a dummy patch; returns the variables dict.

    The whole init is jitted into one XLA program — eager op-by-op dispatch
    of hundreds of initializers is pathologically slow on remote backends.
    """
    import functools

    shape = (1, *_triple(params["patch_size"]), params["chans_in"])
    key = jax.random.PRNGKey(seed)

    @functools.partial(jax.jit, static_argnums=())
    def _init(key):
        x = jnp.zeros(shape, jnp.float32)
        return model.init({"params": key, "dropout": key}, x, train=False)

    return _init(key)


def count_params(variables) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"])))
