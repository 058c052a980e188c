from . import statistics, runtime
from .statistics import SuffStats, Statistics, Stats, get_stats
from .runtime import get_mesh, distribute, mpi_distribute, ensemble, ensemble_stats
