"""Stub coordinates module for the parity shim.

``default_site`` carries the ACT/Simons-Observatory site coordinates
(Cerro Toco, Chile) that pixell ships; the reference ``orphics.time``
reads ``default_site.lat`` / ``default_site.lon`` (time.py:44)."""


class _Site:
    lat = -22.9585
    lon = -67.7876


default_site = _Site()


def __getattr__(name):
    if name.startswith("__"):
        raise AttributeError(name)
    raise NotImplementedError(f"shim pixell.coordinates has no '{name}'")
