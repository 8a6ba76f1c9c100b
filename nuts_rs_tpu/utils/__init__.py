from .bits import trailing_zeros
from .dtypes import default_float, logaddexp
