from . import statistics, runtime, sht
from .statistics import SuffStats, Statistics, Stats, get_stats
from .runtime import (get_mesh, distribute, mpi_distribute, ensemble,
                      ensemble_stats, ensemble_stats_checkpointed,
                      init_multihost)
