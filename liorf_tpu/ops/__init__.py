from . import deskew, icp, knn, plane_fit, scan_match, scancontext

__all__ = ["deskew", "knn", "plane_fit", "scan_match", "icp", "scancontext"]
