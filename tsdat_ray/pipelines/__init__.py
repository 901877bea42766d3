"""tsdat_ray.pipelines"""
