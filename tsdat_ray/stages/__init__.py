"""tsdat_ray.stages"""
