from .mesh import marching_tetrahedra, sdf_to_mesh, save_ply, sample_mesh_surface
