"""Filter graphs (reference: libavfilter/ — SURVEY.md §2.6: push model,
filters implement filter_frame per input pad, frames propagate via
ff_filter_frame avfilter.c:643; graph parsing graphparser.c; format
negotiation formats.c with auto-inserted scale/resample converters).

Device-residency: video filters keep planes as jax arrays when they come
in that way (the vf_hwmap/hwupload pattern is implicit — frames stay in
HBM through the chain; only host-only filters pull them back).
"""

from libav_tpu.filters.graph import FilterGraph, Filter, register_filter
from libav_tpu.filters import vf, af, src  # noqa: F401 (registration)
