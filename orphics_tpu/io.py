"""Facade mirroring reference ``orphics.io``."""
from .utils.io import (save_dict, load_dict, save_pickle, load_pickle,
                       get_hash, hash_dict, mkdir, save_cols, load_cols,
                       config_from_yaml, config_from_file, list_from_config,
                       bin_edges_from_config, cprint, bcolors, get_logger,
                       nostdout, load_path_config)
from .utils.plot import (Plotter, plot_img, hist, html_gallery, power_crop,
                         fplot, fisher_plot, FisherPlots, WhiskerPlot)
