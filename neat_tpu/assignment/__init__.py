from .matching import masked_assignment, auction_assignment, hungarian_callback
from .clustering import dbscan_cluster_means
