"""Active-learning engine."""

from .active_learning import ActiveLearning
from .al_metric import (compute_alc, compute_corr, compute_spearmanr,
                        plot_learning_curves)
from .index_sets import IndexCollection
from .scoring import ScoringConfig, ScoringEngine
