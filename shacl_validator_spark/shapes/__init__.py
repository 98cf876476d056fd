from .compiler import (  # noqa: F401
    compile_pattern,
    compile_shapes,
    constraints_df,
    parse_turtle,
    render_path,
)
from .profiles import PROFILES, profile_shapes_ttl  # noqa: F401
