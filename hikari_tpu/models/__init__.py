"""Scene & asset models: the CPU scene compiler.

Turns meshes/materials/instances into the flat SoA tensors the device
kernels consume (the analog of the reference's `MeshMaterialPlugin` GPU scene
buffers, reference src/mesh_material/mod.rs:488-675).
"""
