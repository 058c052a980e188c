"""Numpy stand-in for the ``timezonefinder`` package (polygon-based
IANA timezone lookup) used by the reference ``orphics.time``
(``time.py:3,43``).

The real package resolves arbitrary coordinates against timezone
polygons; this shim carries the TRUE IANA zones (what timezonefinder
returns) at the coordinates the parity tests exercise, resolved by
nearest-point lookup. It does not import ``orphics_tpu``.
"""
import math

# (lat, lng) -> the zone the real timezonefinder returns there
_POINTS = (
    (-22.9585, -67.7876, "America/Santiago"),    # Cerro Toco (ACT/SO)
    (-23.0229, -67.7548, "America/Santiago"),    # ALMA
    (-29.0146, -70.6926, "America/Santiago"),    # La Silla
    (-90.0, 0.0, "Antarctica/South_Pole"),       # South Pole
    (19.8207, -155.4681, "Pacific/Honolulu"),    # Mauna Kea
    (38.4331, -79.8398, "America/New_York"),     # Green Bank
    (50.5248, 6.8836, "Europe/Berlin"),          # Effelsberg
    (-30.7215, 21.4110, "Africa/Johannesburg"),  # SKA Karoo
    (-31.2749, 149.0672, "Australia/Sydney"),    # Siding Spring
    (28.7569, -17.8925, "Atlantic/Canary"),      # La Palma
    (37.2339, -118.2951, "America/Los_Angeles"), # OVRO
)


class TimezoneFinder:
    def __init__(self, *args, **kwargs):
        pass

    def timezone_at(self, *, lat, lng):
        best, bestd = None, float("inf")
        for plat, plng, zone in _POINTS:
            p1, p2 = math.radians(lat), math.radians(plat)
            dl = math.radians(plng - lng)
            c = (math.sin(p1) * math.sin(p2)
                 + math.cos(p1) * math.cos(p2) * math.cos(dl))
            d = math.acos(max(-1.0, min(1.0, c)))
            if d < bestd:
                best, bestd = zone, d
        return best
