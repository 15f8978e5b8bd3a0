from tpurt.render.intersect import Hit, intersect_scene  # noqa: F401
from tpurt.render.integrator import trace_paths  # noqa: F401
from tpurt.render.renderer import render_frame, render_tile  # noqa: F401
