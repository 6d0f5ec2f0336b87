from .segmentation import SplitMethods, get_split_method, get_split_names
