from .meshio import Mesh, read_obj, write_obj
from .rasterizer import rasterize, render_normal_maps, compute_vertex_normals
from .visualizer import FixedViewRenderer, FlameVisualizer, save_frames_as_video
from .shading import add_sh_light, render_shaded, render_textured, sh_basis
