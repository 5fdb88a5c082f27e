from .dag import Model, run_dag
from .stock import dim_entity, fct_observations, stg_most_actives, stock_dag

__all__ = [
    "Model",
    "dim_entity",
    "fct_observations",
    "run_dag",
    "stg_most_actives",
    "stock_dag",
]
