"""Facade mirroring reference ``orphics.catalogs``."""
from .models.catalogs import (
    binned_map, healpix_binned_map, CatMapper, get_delta, get_delta_healpix,
    random_catalog_flat, get_random_catalog, Pow2Cat, split_samples,
    optimize_splits, select_based_on_mask, merge_duplicates, df_from_fits,
    load_fits, load_boss, BOSSMapper, HSCMapper, read_mangle_ply,
    hp_from_mangle, reconstruct_velocities)
