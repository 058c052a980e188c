"""Minimal numpy-only pixell shim for reference-in-the-loop parity tests.

This package exists so that the *reference* ``orphics.maps`` /
``orphics.lensing`` / ``orphics.pixcov`` modules (which import pixell at
module scope) can run in this environment and be compared numerically
against ``orphics_tpu``. It implements the subset of ``pixell.enmap`` /
``pixell.fft`` / ``pixell.utils`` semantics those comparisons exercise
(CAR patch geometry, unitary enmap FFT conventions, ``spec2flat``'s
flat normalization, ``map_mul``/``multi_pow``, QU<->EB rotation) with
plain numpy. It is NOT a general pixell replacement: curved-sky,
reprojection and IO entry points are stubs that raise on use.

Conventions implemented (documented pixell behavior):
  * ``enmap.fft(m, normalize=True)`` is the unitary FFT
    (raw fft2 / sqrt(npix)); ``enmap.ifft(k, normalize=True)`` is its
    inverse (numpy ifft2 * sqrt(npix)).
  * ``pixell.fft.fft`` is the RAW (unnormalized) transform;
    ``pixell.fft.ifft(..., normalize=True)`` matches numpy ifft.
  * ``spec2flat(shape, wcs, cov, exp)`` returns
    ``(C(|l|) * npix / area) ** exp`` on the 2D l-grid.
  * ``area`` is the flat-sky patch area ny*nx*|dy*dx| (the same
    convention as ``orphics_tpu.geometry.Geometry.area``, so the two
    codebases normalize identically; real pixell integrates cos(dec)).
"""
