from .model import Model
from . import gaussian
