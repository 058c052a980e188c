from . import fourier, binning
from .fourier import (fft2, ifft2, rfft2, irfft2, f2power, power2d,
                      mask_kspace, filter_map, kfilter, gauss_beam,
                      iqu2teb, teb2iqu, queb_rotmat, interp1d_to_2d)
from .binning import Bin2D, bin1d, bin_in_annuli
