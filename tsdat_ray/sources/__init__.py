"""tsdat_ray.sources"""
