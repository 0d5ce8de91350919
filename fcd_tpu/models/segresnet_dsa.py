"""SegResNet_DSA / SegResNetVAE_DSA: residual encoder with dual-self-attention
transformer levels (networks/segresnet_dsa/segresnet_dsa.py:23-374)."""

from __future__ import annotations

from fcd_tpu.models.segresnet import _SegResNetCore


def SegResNet_DSA(**kwargs) -> _SegResNetCore:
    kwargs.setdefault("vae", False)
    assert kwargs.get("dsa_start_level") is not None
    return _SegResNetCore(**kwargs)


def SegResNetVAE_DSA(**kwargs) -> _SegResNetCore:
    kwargs["vae"] = True
    assert kwargs.get("dsa_start_level") is not None
    return _SegResNetCore(**kwargs)
