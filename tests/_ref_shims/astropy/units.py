"""Shim ``astropy.units``: only what orphics.catalogs touches
(`x * u.deg` staying numerically in degrees)."""
deg = 1.0
degree = 1.0
