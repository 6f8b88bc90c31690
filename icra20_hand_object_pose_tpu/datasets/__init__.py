from .synthetic import (  # noqa: F401
    SyntheticFrame,
    SyntheticSequenceConfig,
    generate_sequence,
    hand_base_for_grasp,
    render_frame,
)
