from . import io, plot, fitting, healpix
