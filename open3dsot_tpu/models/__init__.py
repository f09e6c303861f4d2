"""Model registry.

`get_model(name)` mirrors the reference's registry
(/root/reference/models/__init__.py:19-21) but returns our flax model
wrappers. Names are case-insensitive: p2b, bat, m2track.
"""

from __future__ import annotations


def get_model(name: str):
    name = name.lower()
    if name == "m2track":
        from open3dsot_tpu.models.m2track import M2TrackModel

        return M2TrackModel
    if name == "p2b":
        from open3dsot_tpu.models.p2b import P2BModel

        return P2BModel
    if name == "bat":
        from open3dsot_tpu.models.bat import BATModel

        return BATModel
    raise ValueError(f"unknown model {name!r}")
