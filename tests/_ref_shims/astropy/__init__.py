"""Minimal astropy shim for reference-in-the-loop catalog tests: just
enough of ``astropy.io.fits`` (open -> HDUs with .data record arrays,
via orphics_tpu's native FITS bintable reader) and ``astropy.table``
for ``orphics.catalogs`` to import and its host-numpy functions to
run."""
