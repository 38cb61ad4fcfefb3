"""BSDF lobe system: dense, branch-free, differentiable lobe evaluation."""
