from .model import Model, StreamSpec
from . import gaussian
