from .pipeline import (  # noqa: F401
    build_feature_pipeline,
    build_sentiment_pipeline,
    evaluate_f1,
    inspect_weights,
    train_and_evaluate,
)
