from . import camera, icp, knn, knn_pallas, preprocess, pso, render, score  # noqa: F401
