"""Model layer: the Gaussian parameterization hierarchy and the cloth mesh.

Mirrors the reference hierarchy (SURVEY.md §2.2):

- ``gaussian``:        GaussianModel      (scene/gaussian_model.py)
- ``mesh_gaussian``:   MeshGaussianModel  (scene/mesh_gaussian_model.py)
- ``avatar_gaussian``: AvatarGaussianModel / AvatarSimulationModel
                                           (scene/avatar_gaussian_model.py)
- ``mesh_model``:      MeshModel cloth energies (scene/mesh_model.py)

Design difference vs the reference: models are **immutable pytrees** with pure
function transforms, not stateful nn.Modules. Densify/clone/split/prune change
array sizes, which XLA cannot jit — so parameter arrays live in
**capacity-padded buffers with an alive mask**, and structural edits happen
host-side between jitted segments (``gaussian.densify_and_prune``).
"""
