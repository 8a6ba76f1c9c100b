from .model import Model, StreamSpec
from . import gaussian
from . import hierarchical
from . import stochastic_volatility
