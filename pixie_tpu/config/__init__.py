from pixie_tpu.config.core import Config, compose, load_yaml_tree
