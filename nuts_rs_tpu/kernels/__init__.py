from .mclmc import MclmcInfo, MclmcOptions, mclmc_draw
from .nuts import DivergenceInfo, NutsInfo, NutsOptions, nuts_draw
from .nuts_async import AsyncOut, nuts_run_async
