"""Force-evaluation operators: brute force, Barnes-Hut, BVH, FMM."""
