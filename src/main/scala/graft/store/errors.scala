package graft.store

/** Sealed error hierarchy mirroring the reference's exceptions
  * (reference: src/ml_feature_store/store.py:72-81).
  */
sealed abstract class FeatureStoreError(message: String) extends RuntimeException(message)

/** Raised when a feature table or version is not registered
  * (reference: store.py:75-76, 398-401, 416-419).
  */
final class FeatureTableNotFoundError(message: String) extends FeatureStoreError(message)

/** Raised when input data fails validation
  * (reference: store.py:79-81, 422-470).
  */
final class FeatureValidationError(message: String) extends FeatureStoreError(message)

/** Raised when a register detects that another writer advanced the same
  * table on the shared storage root (engine extension — the reference
  * is single-process and cannot race). The losing writer must reopen
  * the store and retry on top of the new version.
  */
final class FeatureConcurrencyError(message: String) extends FeatureStoreError(message)

/** Raised when the underlying storage refuses a physical operation the
  * catalog state says must succeed (e.g. a filesystem rename returning
  * false) — surfaced instead of leaving catalog and storage divergent.
  */
final class FeatureStorageError(message: String) extends FeatureStoreError(message)
