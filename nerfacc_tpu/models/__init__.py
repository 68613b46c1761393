from .encoding import HashGridEncoder, spherical_harmonics_deg4
from .hash_soa import HashGridEncoderFused, HashGridEncoderSoA
from .mlp import (
    MLP,
    NDRTNeRFRadianceField,
    NerfMLP,
    SinusoidalEncoder,
    TNeRFRadianceField,
    VanillaNeRFRadianceField,
)
from .tensorf import KPlanesRadianceField, TensoRFRadianceField
from .ngp import (
    NGPDensityField,
    NGPRadianceField,
    contract_to_unisphere,
    trunc_exp,
)

__all__ = [
    "MLP",
    "NerfMLP",
    "NDRTNeRFRadianceField",
    "SinusoidalEncoder",
    "VanillaNeRFRadianceField",
    "TNeRFRadianceField",
    "HashGridEncoder",
    "HashGridEncoderSoA",
    "HashGridEncoderFused",
    "spherical_harmonics_deg4",
    "NGPRadianceField",
    "NGPDensityField",
    "contract_to_unisphere",
    "trunc_exp",
    "TensoRFRadianceField",
    "KPlanesRadianceField",
]
