from .encoding import HashGridEncoder, spherical_harmonics_deg4
from .mlp import (
    MLP,
    NerfMLP,
    SinusoidalEncoder,
    TNeRFRadianceField,
    VanillaNeRFRadianceField,
)
from .ngp import (
    NGPDensityField,
    NGPRadianceField,
    contract_to_unisphere,
    trunc_exp,
)

__all__ = [
    "MLP",
    "NerfMLP",
    "SinusoidalEncoder",
    "VanillaNeRFRadianceField",
    "TNeRFRadianceField",
    "HashGridEncoder",
    "spherical_harmonics_deg4",
    "NGPRadianceField",
    "NGPDensityField",
    "contract_to_unisphere",
    "trunc_exp",
]
