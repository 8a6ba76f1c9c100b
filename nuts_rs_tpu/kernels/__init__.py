from .nuts import DivergenceInfo, NutsInfo, NutsOptions, nuts_draw
