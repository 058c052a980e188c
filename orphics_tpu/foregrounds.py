"""Facade mirroring reference ``orphics.foregrounds``."""
from .models.foregrounds import *  # noqa: F401,F403
from .models.foregrounds import __all__  # noqa: F401
