from . import theory, grf
from .theory import TheorySpectra, default_theory, load_theory_from_camb
from .grf import MapGen, rand_map, spec2flat, harm2map, map2harm, cmb_ps
