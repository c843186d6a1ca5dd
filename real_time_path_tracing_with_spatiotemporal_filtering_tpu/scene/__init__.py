"""Scene subpackage: OBJ loading, scene pytrees, LBVH acceleration."""
