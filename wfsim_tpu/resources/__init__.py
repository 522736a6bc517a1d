from .loader import Resource, load_config, make_map, DummyMap  # noqa: F401
from .synthetic import (                                        # noqa: F401
    synthetic_spe_distribution, synthetic_noise, synthetic_pmt_ap_cdfs,
    synthetic_ele_ap_pmf, synthetic_garfield_gas_gap)
from .spe import build_uniform_to_pe, spe_table_from_csv        # noqa: F401
