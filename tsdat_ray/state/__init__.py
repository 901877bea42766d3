"""tsdat_ray.state"""
