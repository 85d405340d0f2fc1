from .converters import (
    load_state_dict,
    merge_variables,
    state_dict_to_variables,
    translate_d2_key,
    translate_discriminator_key,
    translate_generator_key,
)

__all__ = [
    "load_state_dict",
    "merge_variables",
    "state_dict_to_variables",
    "translate_d2_key",
    "translate_discriminator_key",
    "translate_generator_key",
]
