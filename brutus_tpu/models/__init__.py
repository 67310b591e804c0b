"""Model-generation layer: bolometric-correction neural nets, MIST track
and isochrone interpolators, and the SED grid generator."""

from .nn import FastNN, FastNNPredictor  # noqa: F401
from .tracks import MISTtracks  # noqa: F401
from .sedmaker import SEDmaker  # noqa: F401
from .isochrone import Isochrone  # noqa: F401
