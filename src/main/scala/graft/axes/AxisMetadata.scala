package graft.axes

import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** Round-trippable axis metadata, mirroring the reference's bins-coordinate
  * attrs (`bin_type`, `right_edge`, `underflow`, `overflow` —
  * xarray-histogram core.py:524-587 `get_coord`).
  *
  * Attached to the `<var>_bins` column of every histogram DataFrame via
  * Spark's column Metadata, which parquet preserves — so a saved histogram
  * can be reloaded and fed to HistStats without re-supplying the axis
  * (the reference's accessor reads the same attrs, accessor.py:107-130).
  */
object AxisMetadata {

  def toMetadata(ax: BinAxis): Metadata = {
    val b = new MetadataBuilder()
      .putString("bin_type", ax.getClass.getSimpleName)
      .putString("name", ax.name)
      .putBoolean("underflow", ax.underflow)
      .putBoolean("overflow", ax.overflow)
    ax match {
      case a: Regular =>
        b.putLong("n", a.n.toLong).putDouble("lo", a.lo).putDouble("hi", a.hi)
          .putString("transform", a.transform.tag)
          .putDouble("right_edge", a.hi)
      case a: Variable =>
        b.putDoubleArray("edges", a.allEdges)
          .putDouble("right_edge", a.allEdges.last)
      case a: IntegerAxis =>
        b.putLong("lo", a.lo).putLong("hi", a.hi)
      case a: IntCategory =>
        b.putLongArray("values", a.values.toArray)
      case a: StrCategory =>
        b.putStringArray("values", a.values.toArray)
      case a: Circular =>
        b.putLong("n", a.n.toLong).putDouble("lo", a.lo).putDouble("hi", a.hi)
          .putDouble("right_edge", a.hi)
    }
    b.build()
  }

  def fromMetadata(m: Metadata): BinAxis = {
    val name = m.getString("name")
    val under = m.getBoolean("underflow")
    val over = m.getBoolean("overflow")
    m.getString("bin_type") match {
      case "Regular" =>
        // Legacy fallback: revisions before the AxTransform ADT wrote a
        // 'log' boolean instead of the 'transform' tag; parquet histograms
        // persisted by them must still round-trip.
        val transform =
          if (m.contains("transform")) AxTransform.fromTag(m.getString("transform"))
          else if (m.contains("log") && m.getBoolean("log")) LogT
          else IdT
        Regular(name, m.getLong("n").toInt, m.getDouble("lo"), m.getDouble("hi"),
          under, over, transform = transform)
      case "Variable" => Variable(name, m.getDoubleArray("edges"), under, over)
      case "IntegerAxis" => IntegerAxis(name, m.getLong("lo"), m.getLong("hi"), under, over)
      case "IntCategory" => IntCategory(name, m.getLongArray("values").toSeq, over)
      case "StrCategory" => StrCategory(name, m.getStringArray("values").toSeq, over)
      case "Circular" =>
        Circular(name, m.getLong("n").toInt, m.getDouble("lo"), m.getDouble("hi"))
      case other => throw new IllegalArgumentException(s"unknown bin_type $other")
    }
  }

  /** Recover the axis from a histogram DataFrame's bins column metadata. */
  def axisOf(df: org.apache.spark.sql.DataFrame, binsCol: String): BinAxis =
    fromMetadata(df.schema(binsCol).metadata)
}
