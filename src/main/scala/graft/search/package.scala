package graft

package object search {
  /** Posting-row tuple on the query path: (field, term, rangeId, firstDocId,
    * payload, posPayload|null, dels|null). `dels` is the row's range's sorted
    * delete array in RANGED delete mode (see IndexSearcher), null otherwise.
    */
  private[search] type PRow =
    (String, String, Long, Long, Array[Byte], Array[Byte], Array[Long])
}
